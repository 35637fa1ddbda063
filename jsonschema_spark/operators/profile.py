"""Column-distribution profiling: histograms, quantiles, heavy hitters.

The drift checks (operators/drift.py) compare two relations; these operators
profile ONE relation so its shape can be recorded per partition/snapshot and
diffed across runs — the metrics rows the north rule checkpoints alongside
verdicts. All three are single-aggregation plans:

- histogram: one groupBy over a computed bin id (map-side partial combine,
  one shuffle of <= n_bins rows per partition);
- quantiles: exact `percentile` for oracle parity at test scale, plus
  `approx_percentile` (mergeable t-digest-style sketch, bounded error) as
  the 100 TB path — same shuffle shape as any aggregate;
- heavy hitters: groupBy count + one small top-k sort; partial aggregation
  bounds the shuffle by distinct-value count, and the final rank runs over
  an already-aggregated relation.

Reference analogue: none (metrics extension over the reference's per-column
checks; kaptinlin/jsonschema validates shapes but does not profile data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "histogram",
    "quantiles",
    "approx_quantiles",
    "heavy_hitters",
    "key_candidates",
    "fd_violations",
    "benford_first_digit",
    "json_key_profile",
    "schema_from_profile",
]


def key_candidates(
    df: DataFrame, columns: list[str] | None = None, *, approx: bool = False
) -> DataFrame:
    """Candidate-key discovery: one tall row per column with its exact
    distinct count, NULL count, and whether it is a valid unique key
    (distinct == rows AND no NULLs) — the profiling step that decides which
    column the uniqueness check (operators/uniqueness.py) should run on and
    which joins are safe to treat as 1:1.

    One aggregation pass: Spark plans multi-column count(DISTINCT) as an
    Expand (n_cols rows per input row) feeding ONE map-side-combining
    aggregate — a single shuffle whose width is the distinct-value counts,
    not the table. At extreme widths set `approx=True` to swap in HLL
    sketches (`approx_count_distinct`, ~2% error): `is_key` then means
    "cardinality within HLL error of the row count" and must be confirmed
    by the exact uniqueness check before being relied on.
    """
    cols = columns or df.columns
    n_distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(n_distinct(F.col(c)).alias(f"__d_{c}"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__n_{c}"))
    row = df.agg(*aggs)
    tall = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("__rows").alias("n_rows"),
                        F.col(f"__d_{c}").alias("n_distinct"),
                        F.col(f"__n_{c}").alias("n_null"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    return tall.withColumn(
        "is_key",
        (F.col("n_distinct") == F.col("n_rows")) & (F.col("n_null") == F.lit(0)),
    )


def histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equal-width histogram: (bin, lo, hi, cnt) rows, empty bins included.

    Bin arithmetic is plain floor((x-lo)/width) clamped to [0, n_bins-1]
    (top edge closed) — deliberately NOT width_bucket, so any SQL engine
    reproduces the exact same bin ids for oracles. When lo/hi are not given
    they come from a first aggregate pass; at scale pass known bounds (e.g.
    from column_stats of the previous snapshot) to keep it single-pass.
    Empty bins are restored with a broadcast range join so consumers can
    diff histograms positionally.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if lo is None or hi is None:
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if not hi > lo:
        hi = lo + 1.0  # degenerate domain: single bin catches everything
    width = (hi - lo) / n_bins
    x = F.col(col).cast("double")
    bin_id = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    counts = (
        df.filter(x.isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = df.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    return (
        bins.join(F.broadcast(counts), "bin", "left")
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )


def quantiles(df: DataFrame, columns: list[str], probs: list[float]) -> DataFrame:
    """Exact interpolated quantiles, long form: (column, prob, value).

    Spark's `percentile` (rank p*(n-1), linear interpolation — the type-7
    estimator) matches DuckDB/Postgres `quantile_cont`/`percentile_cont`,
    so results are oracle-comparable bit-for-bit on doubles. Exact
    percentile sorts values per group — fine at test scale and for
    bounded-cardinality columns; use approx_quantiles at 100 TB.
    """
    aggs = []
    for c in columns:
        for p in probs:
            aggs.append(
                F.percentile(F.col(c).cast("double"), F.lit(p)).alias(f"q__{c}__{p!r}")
            )
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', CAST({p!r} AS DOUBLE), `q__{c}__{p!r}`" for c in columns for p in probs
    )
    n = len(columns) * len(probs)
    return wide.selectExpr(f"stack({n}, {stack}) as (column, prob, value)")


def approx_quantiles(
    df: DataFrame, columns: list[str], probs: list[float], accuracy: int = 10000
) -> DataFrame:
    """Approximate quantiles — the 100 TB path: (column, prob, value).

    `approx_percentile` keeps a mergeable fixed-size sketch per partition
    (error <= 1/accuracy in rank), so memory is bounded regardless of row
    count and partial states merge in one shuffle. Values are drawn from the
    data (no interpolation); error vs the exact estimator is pinned by
    tests/test_profile.py, not by an equality oracle.
    """
    aggs = []
    for c in columns:
        for p in probs:
            aggs.append(
                F.approx_percentile(
                    F.col(c).cast("double"), F.lit(p), F.lit(accuracy)
                ).alias(f"q__{c}__{p!r}")
            )
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', CAST({p!r} AS DOUBLE), `q__{c}__{p!r}`" for c in columns for p in probs
    )
    n = len(columns) * len(probs)
    return wide.selectExpr(f"stack({n}, {stack}) as (column, prob, value)")


def heavy_hitters(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Top-k most frequent values of `col` with a DETERMINISTIC tie-break
    (count desc, value asc) so two engines agree on the boundary: returns
    (value, cnt, rank). Nulls are excluded (they are null_rate's business).

    Plan: partial-aggregated groupBy (shuffle bounded by distinct values),
    then row_number over the tiny aggregated relation. The single-partition
    window is safe ONLY because its input is post-aggregation; for
    ultra-high-cardinality columns cap the window input first (e.g. filter
    cnt above a support threshold) — documented contract, not a hidden sort
    of the raw table.
    """
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("value", "cnt", "rank")
    )


def fd_violations(df: DataFrame, pairs: list) -> DataFrame:
    """Functional-dependency check for given (determinant, dependent)
    column pairs: does A → B hold, and if not, how broken is it? Output
    one row per pair: (determinant, dependent, n_groups,
    n_violating_groups, n_repair_rows, holds) where `n_repair_rows` is the
    minimum number of rows whose B would have to change to make the FD
    hold (Σ over violating A-groups of group_size − majority-B count) —
    the standard FD-repair distance, far more actionable than a boolean.

    Scale shape per pair: groupBy (A, B) with map-side combine bounds the
    first exchange by the distinct pair count; everything after runs on
    the aggregated relation. Rows with NULL in either column are excluded
    (SQL FD semantics are NULL-free). The single-column profile
    complement is `key_candidates`; this is the cross-column half of the
    profiling story (HyFD-style, for a candidate list — discovery over
    all O(n²) pairs is the caller's loop)."""
    out = None
    for det, dep in pairs:
        base = df.where(F.col(det).isNotNull() & F.col(dep).isNotNull())
        pair_counts = base.groupBy(
            F.col(det).alias("_a"), F.col(dep).alias("_b")
        ).agg(F.count(F.lit(1)).alias("_n"))
        per_group = pair_counts.groupBy("_a").agg(
            F.count(F.lit(1)).alias("_n_b"),
            F.sum("_n").alias("_total"),
            F.max("_n").alias("_max"),
        )
        row = per_group.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("_n_b") > 1).cast("bigint")).alias("n_violating_groups"),
            F.sum(F.col("_total") - F.col("_max")).alias("n_repair_rows"),
        ).select(
            F.lit(det).alias("determinant"),
            F.lit(dep).alias("dependent"),
            "n_groups",
            "n_violating_groups",
            "n_repair_rows",
            (F.col("n_violating_groups") == 0).alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def benford_first_digit(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law conformance of a numeric column: observed first-digit
    frequencies vs log10(1 + 1/d), with the per-digit chi-square term —
    the classic fabricated-data / unit-mix smell test for financial-style
    magnitudes (a synthetic column generated uniform fails it loudly;
    multiplicative real-world data passes). Rows with |value| < 1 are
    excluded (no leading digit). Output 9 rows: (digit, n, p_obs, p_exp,
    chi2_term), snapped on the 1e-6 grid; Σ chi2_term against χ²(8) is
    the caller's verdict. Expected probabilities are emitted as exact
    double LITERALS (computed once host-side), so both engines consume
    bit-identical constants. One groupBy over ≤ 9 digits — map-side
    combine makes the exchange 9 rows per task at any scale."""
    import math

    v = F.abs(F.col(col))
    digit = F.substring(F.floor(v).cast("bigint").cast("string"), 1, 1).cast("int")
    counts = (
        df.where(F.col(col).isNotNull() & (v >= 1))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("_t"))
    p_exp = F.lit(0.0)
    for d in range(1, 10):
        p_exp = F.when(F.col("digit") == d, F.lit(math.log10(1 + 1 / d))).otherwise(
            p_exp
        )
    snap = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)  # noqa: E731
    p_obs = F.col("n") / F.col("_t")
    chi2 = (p_obs - p_exp) * (p_obs - p_exp) / p_exp * F.col("_t")
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        snap(p_obs).alias("p_obs"),
        snap(p_exp).alias("p_exp"),
        snap(chi2).alias("chi2_term"),
    )


def json_key_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Schema inference from raw JSON DATA: per top-level key, the
    JSON-Schema type, presence count, presence fraction, and a `required`
    verdict — the data-driven cousin of the footer-driven `schemagen` CLI
    (which needs typed parquet; this works on a semi-structured string
    column you have not schematized yet, the usual state of a `props`
    bag). Feed the output to a schema author (or `builder.py`) and
    `compat.schema_compat` can police the bag's drift from then on.

    Engine shape: ONE parse_json per row (the repo-wide variant rule),
    cast to map<string,variant>, key explode, and a map-side-combining
    groupBy over (key, type) — the exchange carries distinct (key, type)
    cells, never rows. Types come from `schema_of_variant` lowered to
    JSON-Schema names (BIGINT/DECIMAL(p,0) → integer, other numerics →
    number, VOID → null, ARRAY/STRUCT prefixes → array/object; same
    contract as plans/variant.py)."""
    parsed = F.try_parse_json(F.col(json_col))
    entries = df.where(F.col(json_col).isNotNull()).select(
        F.explode(parsed.try_cast("map<string,variant>")).alias("key", "_v")
    )
    st = F.schema_of_variant(F.col("_v"))
    jtype = (
        F.when(st == "VOID", F.lit("null"))
        .when(st == "BOOLEAN", F.lit("boolean"))
        .when(st == "STRING", F.lit("string"))
        .when(
            (st == "BIGINT") | st.rlike("^DECIMAL\\([0-9]+,0\\)$"), F.lit("integer")
        )
        .when(st.startswith("ARRAY"), F.lit("array"))
        .when(
            st.startswith("STRUCT") | st.startswith("OBJECT") | st.startswith("MAP"),
            F.lit("object"),
        )
        .otherwise(F.lit("number"))
    )
    counts = entries.select("key", jtype.alias("jtype")).groupBy("key", "jtype").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = df.where(F.col(json_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("_t")
    )
    snap = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)  # noqa: E731
    # required = the KEY (any type) is present in every document; computed
    # over the tiny aggregated relation
    n_key = F.sum("n").over(Window.partitionBy("key"))
    return counts.crossJoin(F.broadcast(total)).select(
        "key",
        "jtype",
        "n",
        snap(F.col("n") / F.col("_t")).alias("frac"),
        (n_key == F.col("_t")).alias("required"),
    )


def schema_from_profile(profile_rows, *, extra_threshold: float = 0.0) -> dict:
    """Turn `json_key_profile` output rows into a draft 2020-12 object
    schema: per-key `type` (a union list when the data showed mixed
    types, sorted for determinism), `required` for keys present in every
    document, and keys whose presence fraction is ≤ `extra_threshold`
    dropped entirely (noise keys a proposer should not enshrine). The
    infer → validate loop closes: the proposed schema accepts every
    document it was profiled from (tested), and `compat.schema_compat`
    can police drift between two snapshots' proposals."""
    by_key: dict = {}
    required: set = set()
    for r in profile_rows:
        key, jtype, frac, req = r["key"], r["jtype"], r["frac"], r["required"]
        if frac <= extra_threshold:
            continue
        by_key.setdefault(key, set()).add(jtype)
        if req:
            required.add(key)
    props = {}
    for key, types in sorted(by_key.items()):
        ts = sorted(types)
        props[key] = {"type": ts[0] if len(ts) == 1 else ts}
    schema: dict = {"type": "object", "properties": props}
    if required:
        schema["required"] = sorted(required)
    return schema
