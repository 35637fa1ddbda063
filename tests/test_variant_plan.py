"""Variant-plan conformance: the JVM dynamic-JSON compiler must reproduce the
scalar core's verdicts on every official draft2020-12 suite case whose schema
falls in the variant-supported subset (the rest route to the UDF path)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.plans.variant import VariantCompileError, VariantPlanCompiler
from tests.suite_loader import CORE_NO_REMOTE_FILES, iter_tests, suite_available

pytestmark = pytest.mark.skipif(not suite_available(), reason="suite not vendored")

_CHUNK = 40


def _jdump(o) -> str:
    from fractions import Fraction

    def default(x):
        if isinstance(x, Fraction):
            return int(x) if x.denominator == 1 else float(x)
        raise TypeError(type(x))

    return json.dumps(o, default=default)


def _supported_cases():
    """[(schema, [(data_json, expected), ...])] for variant-compilable schemas."""
    by_schema: dict[str, list] = {}
    schemas: dict[str, object] = {}
    for filename in CORE_NO_REMOTE_FILES:
        for _case, _test, schema, data, expected in iter_tests(filename):
            key = json.dumps(schema, sort_keys=True, default=str)
            schemas[key] = schema
            by_schema.setdefault(key, []).append((_jdump(data), expected))
    out = []
    for key, cases in by_schema.items():
        try:
            # full expression build (driver-side, lazy) — catches
            # unresolvable $refs and unsupported shapes, not just keywords
            VariantPlanCompiler(schemas[key], assert_format=False).valid_column(
                F.try_parse_json(F.lit("null"))
            )
        except Exception:
            continue
        out.append((schemas[key], cases))
    return out


def test_variant_plan_official_suite(spark):
    groups = _supported_cases()
    assert len(groups) >= 270, f"variant subset too small: {len(groups)} schemas"

    total = failures = 0
    for i in range(0, len(groups), _CHUNK):
        chunk = groups[i : i + _CHUNK]
        rows = []
        for sid, (_schema, cases) in enumerate(chunk):
            for data_json, expected in cases:
                rows.append((sid, data_json, expected))
        df = spark.createDataFrame(rows, "sid int, data_json string, expected boolean")
        v = F.try_parse_json("data_json")
        expr = F.lit(None).cast("boolean")
        for sid in range(len(chunk) - 1, -1, -1):
            plan = VariantPlanCompiler(chunk[sid][0], assert_format=False)
            expr = F.when(F.col("sid") == sid, plan.valid_column(v)).otherwise(expr)
        got = df.withColumn("valid", expr).collect()
        for r in got:
            total += 1
            if bool(r["valid"]) != r["expected"]:
                failures += 1
                if failures <= 10:
                    print(
                        f"DIFF sid={r['sid']} schema={json.dumps(chunk[r['sid']][0])[:120]} "
                        f"data={r['data_json'][:80]} got={r['valid']} want={r['expected']}"
                    )
    assert failures == 0, f"{failures}/{total} variant-plan disagreements"
    assert total > 500


def test_stage_names_globally_unique_across_compilers(spark):
    """Two compiler instances appending to ONE shared stages list (e.g. two
    contentSchema sites in a typed plan) must never collide on stage names —
    a caller attaching stages via a single select or deduping by name would
    silently miscompute otherwise."""
    from pyspark.sql import functions as F

    from jsonschema_spark.plans.variant import VariantPlanCompiler

    stages: list = []
    for _ in range(2):
        c = VariantPlanCompiler({"patternProperties": {"^a": {"type": "string"}}})
        c.violations_column(F.try_parse_json(F.lit('{"a":1}')), stages=stages)
    assert stages, "expected staged subexpressions"
    names = [n for n, _ in stages]
    assert len(names) == len(set(names)), names


def test_variant_plan_cache_reuses_and_discriminates(spark):
    """Same (schema, flags) in one session → same compiled plan object;
    different schema or flags → fresh compile; mutated dict → fresh compile."""
    from jsonschema_spark.plans import variant as V

    df = spark.createDataFrame([("{}",)], "doc: string")
    s1 = {"type": "object", "properties": {"a": {"type": "integer"}}}
    p1 = V._compiled_variant_plan(df, s1, True, 5)
    p2 = V._compiled_variant_plan(df, s1, True, 5)
    assert p1 is p2
    assert V._compiled_variant_plan(df, s1, False, 5) is not p1
    assert V._compiled_variant_plan(df, s1, True, 2) is not p1
    s1["properties"]["a"] = {"type": "string"}   # caller mutates the dict
    assert V._compiled_variant_plan(df, s1, True, 5) is not p1
