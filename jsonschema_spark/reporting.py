"""Report-time output formats over violation rows — the reference's
EvaluationResult renderers re-expressed set-at-a-time (result.go:187-298:
ToFlag / ToList(includeHierarchy=false) / LocalizedDetailedErrors).

Codes, not messages, are the wire contract (SURVEY §1.4); message rendering
happens HERE, at report time, from the locale catalog — never inside the
validation pipeline."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.errors import EN_MESSAGES, catalog_for, locales

__all__ = [
    "flag_output",
    "list_output",
    "localized_output",
    "hierarchical_output",
    "partition_verdicts",
    "violations_delta",
]


def flag_output(validated: DataFrame, id_cols: list[str], valid_col: str = "valid") -> DataFrame:
    """ToFlag analogue: (ids..., valid) only (result.go:187-191)."""
    return validated.select(*id_cols, valid_col)


def list_output(
    validated: DataFrame, id_cols: list[str], violations_col: str = "violations"
) -> DataFrame:
    """Flat ToList analogue: one row per violation, sorted deterministically
    (the reference sorts plural property lists — properties.go:62; we order
    by (ids, instance_path, keyword))."""
    out = validated.select(*id_cols, F.explode(violations_col).alias("v")).select(
        *id_cols,
        F.col("v.instance_path").alias("instance_path"),
        F.col("v.keyword").alias("keyword"),
        F.col("v.code").alias("code"),
        F.col("v.params").alias("params"),
    )
    return out.orderBy(*id_cols, "instance_path", "keyword")


def _message_map(locale: str = "en") -> Column:
    """locale catalog as a MapType literal — template substitution happens in
    one JVM expression (codes stay the contract; messages are presentation).
    Codes missing from a locale fall back to English, like render_message."""
    catalog = catalog_for(locale)
    kv: list[Column] = []
    for code, en_msg in sorted(EN_MESSAGES.items()):
        kv.append(F.lit(code))
        kv.append(F.lit(catalog.get(code, en_msg)))
    return F.create_map(*kv)


def localized_output(
    validated: DataFrame,
    id_cols: list[str],
    *,
    locale: str = "en",
    violations_col: str = "violations",
) -> DataFrame:
    """LocalizedDetailedErrors analogue: (ids..., instance_path, message).

    Message templates come from the locale catalog; `{param}` placeholders
    are filled from the violation's params map. Template substitution runs
    JVM-side via aggregate over the params entries (no Python)."""
    if locale not in locales():
        raise ValueError(
            f"unknown locale {locale!r}; registered: {locales()} "
            "(add catalogs via errors.register_locale)"
        )
    rows = validated.select(*id_cols, F.explode(violations_col).alias("v"))
    template = F.coalesce(
        F.element_at(_message_map(locale), F.col("v.code")), F.col("v.code")
    )
    message = F.aggregate(
        F.map_entries(F.col("v.params")),
        template,
        lambda acc, kv: F.replace(
            acc, F.concat(F.lit("{"), kv["key"], F.lit("}")), kv["value"]
        ),
    )
    return rows.select(
        *id_cols,
        F.col("v.instance_path").alias("instance_path"),
        F.col("v.code").alias("code"),
        message.alias("message"),
    ).orderBy(*id_cols, "instance_path", "code")


def hierarchical_output(
    validated: DataFrame,
    id_cols: list[str],
    *,
    locale: str = "en",
    violations_col: str = "violations",
    valid_col: str = "valid",
) -> DataFrame:
    """ToList(includeHierarchy=true) analogue (reference result.go:195-232):
    (ids..., valid, report) where report is a JSON document nesting error
    details by instance location. The reference nests by evaluation path;
    this engine's flat violation rows carry instance paths, so the hierarchy
    groups by instance-path prefix (documented divergence — the flat list of
    `list_output` remains the wire contract, SURVEY §1.4). Rendering is
    report-time presentation, Arrow-batched."""
    import json as _json

    from jsonschema_spark.errors import render_message

    @F.pandas_udf("string")
    def _render(viols: pd.Series) -> pd.Series:
        def build(vlist) -> str:
            vlist = list(vlist) if vlist is not None else []
            root: dict = {"valid": not vlist, "instanceLocation": "", "errors": {}, "details": []}
            nodes = {"": root}

            def node_for(path: str) -> dict:
                if path in nodes:
                    return nodes[path]
                parent = node_for(path.rsplit("/", 1)[0] if "/" in path else "")
                n: dict = {"valid": False, "instanceLocation": path, "errors": {}, "details": []}
                parent["details"].append(n)
                nodes[path] = n
                return n

            by_path: dict[str, list] = {}
            for v in vlist:
                by_path.setdefault(v["instance_path"], []).append(v)
            for path in sorted(by_path):
                n = node_for(path)
                n["valid"] = False
                for v in by_path[path]:
                    msg = render_message(v["code"], dict(v["params"] or {}), locale)
                    prev = n["errors"].get(v["keyword"])
                    # two violations can share (instance path, keyword) — e.g.
                    # two failing allOf branches each contributing a 'minimum'
                    # failure at the root; join rather than overwrite
                    n["errors"][v["keyword"]] = msg if prev is None else f"{prev}; {msg}"
            return _json.dumps(root, ensure_ascii=False)

        return viols.map(build)

    return validated.select(
        *id_cols, F.col(valid_col).alias("valid"), _render(F.col(violations_col)).alias("report")
    )


def partition_verdicts(
    validated: DataFrame,
    partition_expr: Column,
    valid_col: str = "valid",
) -> DataFrame:
    """Per-partition pass/fail verdicts (north rule): bool_and(valid) plus
    doc/valid counts, grouped by the caller's partition expression."""
    return (
        validated.groupBy(partition_expr.alias("partition"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum(F.col(valid_col).cast("long")).alias("valid_count"),
            F.bool_and(valid_col).alias("passed"),
        )
        .orderBy("partition")
    )


def violations_delta(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Snapshot-to-snapshot violation diff — the regression-triage primitive
    for a recurring validation run (north-rule extension; no reference
    analogue — the Go validator is single-invocation). Both inputs are
    violation-row relations (key_cols + instance_path/keyword/code, the
    `list_output` shape); the result labels every violation `new` (in the
    current run only), `resolved` (previous run only), or `persisting`.

    Scale shape: ONE full-outer sort-merge/shuffled-hash join keyed on the
    full violation identity (ids + path + keyword + code) — both sides
    exchange bare key tuples, no payload columns, no driver collection;
    a day-over-day run on 10^12 docs diffs violation sets whose size is
    bounded by the defect rate, not the corpus."""
    jk = [*key_cols, "instance_path", "keyword", "code"]
    o = old.select(*jk).withColumn("__o", F.lit(1))
    n = new.select(*jk).withColumn("__n", F.lit(1))
    j = o.join(n, jk, "full_outer")
    status = (
        F.when(F.col("__o").isNull(), F.lit("new"))
        .when(F.col("__n").isNull(), F.lit("resolved"))
        .otherwise(F.lit("persisting"))
    )
    return j.select(*jk, status.alias("status"))
