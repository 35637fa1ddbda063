"""Per-column statistics + cardinality (north rule: min/max/null-rate, HLL).

All built-in Spark aggregates: partial (map-side) + final hash aggregation,
one shuffle of pre-aggregated partials — scales linearly with executors.
HLL sketches via ``hll_sketch_agg`` (Spark 3.5+) are mergeable per-partition
states, checkpointable for resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_stats", "column_cardinality", "robust_outliers", "derived_column_violations", "concentration"]


def column_stats(
    df: DataFrame, columns: list[str] | None = None, *, stringify: bool = True
) -> DataFrame:
    """Long-form stats: one row per column with min/max/null_rate/count.

    With ``stringify`` (default) min/max are rendered as strings so
    heterogeneous column types can share one result relation (the
    violation/metrics sink is uniform); pass ``stringify=False`` when all
    profiled columns share a type and native values are wanted.
    """
    columns = columns or df.columns
    # ONE pass: all columns' aggregates in a single hash aggregation (partial
    # map-side combine, one tiny shuffle), then unpivot driver-free via stack.
    # The per-column-agg-then-union alternative scans the table len(columns)
    # times — fatal at 100 TB.
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in columns:
        mn, mx = F.min(c), F.max(c)
        if stringify:
            mn, mx = mn.cast("string"), mx.cast("string")
        aggs.append(F.count(c).alias(f"np__{c}"))
        aggs.append(mn.alias(f"mn__{c}"))
        aggs.append(mx.alias(f"mx__{c}"))
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `np__{c}`, `mn__{c}`, `mx__{c}`" for c in columns)
    return wide.selectExpr(
        "__n_rows",
        f"stack({len(columns)}, {stack_expr}) as (column, n_present, min_value, max_value)",
    ).select(
        "column",
        F.col("__n_rows").alias("n_rows"),
        "n_present",
        "min_value",
        "max_value",
        (1.0 - F.col("n_present") / F.col("__n_rows")).alias("null_rate"),
    )


def column_cardinality(df: DataFrame, columns: list[str] | None = None, rsd: float = 0.05) -> DataFrame:
    """Approximate distinct counts (HLL) per column, plus exact for contrast.

    At 10^12 rows only the HLL path is viable; exact is for test oracles.
    """
    columns = columns or df.columns
    aggs = []
    for c in columns:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"approx__{c}"))
        aggs.append(F.countDistinct(c).alias(f"exact__{c}"))
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `approx__{c}`, `exact__{c}`" for c in columns)
    return wide.selectExpr(
        f"stack({len(columns)}, {stack_expr}) as (column, approx_distinct, exact_distinct)"
    )


def _snap6(col):
    """Nudge-then-floor 1e-6 grid snap (the repo's cross-engine float rule:
    round() has engine-divergent decimal-tie semantics, bare floor() splits
    mathematically-on-grid values)."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)


def _hist_median(counts: DataFrame, key: str, value: str, weight: str) -> DataFrame:
    """Exact type-7 median per `key` from a (key, value, weight) histogram.

    Replicates Spark's `percentile` interpolation bit-for-bit (Percentile.
    scala: position = (n-1)*p, result = (higher-position)*v_lo +
    (position-lower)*v_hi) so swapping the sort-based aggregate for this
    histogram path changes the PLAN, never the value — DuckDB
    quantile_cont oracles stay green unchanged. The window runs over the
    distinct-VALUE relation (bounded by the value domain, not the row
    count), so the per-key sort is over histogram rows only."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(value)
    wn = Window.partitionBy(key)
    ranked = counts.select(
        key,
        F.col(value).alias("__v"),
        F.sum(weight).over(w).alias("__cum"),
        F.sum(weight).over(wn).alias("__n"),
    )
    pos = (F.col("__n") - 1).cast("double") * F.lit(0.5)
    k1 = F.floor(pos) + 1  # 1-based rank of the lower order statistic
    frac = pos - F.floor(pos).cast("double")
    return (
        ranked.select(
            key,
            F.min(F.when(F.col("__cum") >= k1, F.col("__v"))).over(wn).alias("__v1"),
            F.min(F.when(F.col("__cum") >= k1 + 1, F.col("__v"))).over(wn).alias("__v2"),
            frac.alias("__frac"),
        )
        .groupBy(key)
        .agg(
            F.min(
                F.when(
                    F.col("__frac") > 0,
                    (F.lit(1.0) - F.col("__frac")) * F.col("__v1")
                    + F.col("__frac") * F.col("__v2"),
                ).otherwise(F.col("__v1"))
            ).alias("__median")
        )
    )


def robust_outliers(
    df: DataFrame, columns: list[str], *, k: float = 3.5
) -> DataFrame:
    """Median/MAD robust outlier summary per numeric column: one row
    (column, n_present, med, mad, n_outliers) where an outlier is a present
    value with ``|x - med| > k * mad``.

    Min/max/mean-based checks (column_stats) miss contamination that robust
    location/scale catches: a corrupted 1% tail moves the mean and explodes
    the stddev, but median and MAD (median absolute deviation) have 50%
    breakdown — the standard data-quality screen for pipeline-scale numeric
    sanity (Iglewicz-Hoaglin; k in plain MAD multiples, default 3.5).

    Plan: the table is scanned ONCE into a long-form (column, value, count)
    histogram (map-side-combining groupBy). Everything downstream — the
    median, the deviation histogram |v - med| (re-aggregated, since distinct
    values can collide after abs), the MAD, and the outlier counts — derives
    from that bounded relation, so cost past the scan depends on the value
    domain, not the row count (the sort-based exact `percentile` aggregate
    this replaced scanned 3x and sorted every row twice — 5.6s -> ~0.6s at
    sf0.1, identical output). The histogram is persisted for its three
    consumers and released after the (n_cols)-row result materializes.
    med/mad are snapped to the 1e-6 grid (nudge-then-floor) BEFORE the
    threshold compare, so the decision boundary is the same IEEE double in
    every engine. For truly continuous high-cardinality columns where even
    the distinct-value relation is too large, pre-quantize `df` or swap
    `approx_percentile` in — the counting pass is unchanged.
    """
    stack = ", ".join(f"'{c}', `{c}`" for c in columns)
    cnt = (
        df.selectExpr(f"stack({len(columns)}, {stack}) as (column, v)")
        .where(F.col("v").isNotNull())
        .groupBy("column", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    med = _hist_median(cnt, "column", "v", "cnt").select(
        "column", _snap6(F.col("__median")).alias("med")
    )
    dev = (
        cnt.join(F.broadcast(med), "column")
        .groupBy("column", F.abs(F.col("v") - F.col("med")).alias("d"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = _hist_median(dev, "column", "d", "cnt").select(
        "column", _snap6(F.col("__median")).alias("mad")
    )
    stats = med.join(mad, "column")
    out = (
        cnt.join(F.broadcast(stats), "column")
        .groupBy("column")
        .agg(
            F.sum("cnt").alias("n_present"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("v") - F.col("med")) > F.lit(float(k)) * F.col("mad"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
        .select("column", "n_present", "med", "mad", "n_outliers")
        .persist()
    )
    out.count()  # materialize the n_cols-row result, then release the histogram
    cnt.unpersist()
    return out


def derived_column_violations(
    df: DataFrame,
    rules: dict,
    *,
    id_cols: tuple = ("doc_id",),
) -> DataFrame:
    """Stored-vs-recomputed consistency: for each rule ``column -> expr``
    (the expression that SHOULD reproduce the stored column), emit one
    violation row (ids..., column, stored, recomputed) wherever they
    differ (null-safe: a null stored vs non-null recomputed IS a
    violation, two nulls are not).

    Derived columns (char counts, token counts, digests, offsets) go stale
    when upstream rewrites payloads without re-deriving — the corruption
    class schema validation can't catch because both values are
    individually valid. This is the dataset-level analogue of the span
    offset re-validation in the north rule.

    One narrow projection per row: every rule is checked in a single pass
    (array of violation structs -> filter non-null -> ONE explode), values
    stringified so heterogeneous columns share the violation relation —
    same convention as column_stats. No shuffle, no Python; rides the scan.
    """
    checks = F.array(
        *[
            F.when(
                ~F.col(col).eqNullSafe(expr),
                F.struct(
                    F.lit(col).alias("column"),
                    F.col(col).cast("string").alias("stored"),
                    expr.cast("string").alias("recomputed"),
                ),
            )
            for col, expr in rules.items()
        ]
    )
    return (
        df.select(*id_cols, F.explode(F.filter(checks, lambda x: x.isNotNull())).alias("v"))
        .select(*id_cols, "v.column", "v.stored", "v.recomputed")
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact per-group type-7 quantiles from ONE table scan: (group, p, q)
    for every group × requested probability.

    Plan shape (same trick as robust_outliers): the scan collapses to a
    (group, value, count) histogram with a map-side-combining groupBy, the
    histogram rows fan out ×|probs| row-locally, and every quantile is a
    window interpolation over the bounded distinct-value relation — cost
    past the scan depends on the value domain, never the row count, and
    the per-group sort is histogram rows only. The sort-based exact
    `percentile` aggregate this avoids re-sorts every raw row per prob.
    Interpolation replicates Spark/DuckDB type-7 exactly; outputs snap to
    the 1e-6 grid (nudge-then-floor) for cross-engine comparison."""
    from pyspark.sql import Window

    cnt = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    h = cnt.select(
        "grp",
        "v",
        "cnt",
        F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("p"),
    )
    w = Window.partitionBy("grp", "p").orderBy("v")
    wn = Window.partitionBy("grp", "p")
    ranked = h.select(
        "grp",
        "p",
        F.col("v").alias("__v"),
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(wn).alias("__n"),
    )
    pos = (F.col("__n") - 1).cast("double") * F.col("p")
    k1 = F.floor(pos) + 1
    frac = pos - F.floor(pos).cast("double")
    interp = (
        ranked.select(
            "grp",
            "p",
            F.min(F.when(F.col("__cum") >= k1, F.col("__v"))).over(wn).alias("__v1"),
            F.min(F.when(F.col("__cum") >= k1 + 1, F.col("__v"))).over(wn).alias("__v2"),
            frac.alias("__frac"),
        )
        .groupBy("grp", "p")
        .agg(
            F.min(
                F.when(
                    F.col("__frac") > 0,
                    (F.lit(1.0) - F.col("__frac")) * F.col("__v1")
                    + F.col("__frac") * F.col("__v2"),
                ).otherwise(F.col("__v1"))
            ).alias("__q")
        )
    )
    return interp.select(
        F.col("grp").alias(group_col),
        "p",
        _snap6(F.col("__q")).alias("q"),
    )


def equal_frequency_bins(
    df: DataFrame,
    value_col: str,
    *,
    n_bins: int = 4,
) -> DataFrame:
    """Equal-frequency (quantile) binning summary: one row per bin with
    (bin, lo, hi, n) where the edges are the type-7 quantiles at
    i/n_bins — the standard feature-discretization step before training a
    tree/NB model on a heavy-tailed numeric signal.

    Plan: edges come from the single-scan bounded value histogram
    (`group_quantiles` machinery, one global group); the assignment pass
    re-aggregates the SAME histogram against the broadcast edge row —
    raw rows are scanned once, assignment work is O(distinct values ×
    n_bins). Bin membership: lo <= v <= hi for bin i with half-open
    semantics enforced by rank (a value equal to an interior edge lands
    in the LOWER bin, matching SQL `v <= hi ORDER BY bin LIMIT 1`)."""
    probs = tuple(i / n_bins for i in range(n_bins + 1))
    edges = group_quantiles(
        df.select(F.lit("g").alias("__g"), F.col(value_col)),
        "__g",
        value_col,
        probs=probs,
    ).select("p", "q")
    piv = edges.groupBy().pivot("p", [float(p) for p in probs]).agg(F.min("q"))
    cols = [F.col(f"`{float(p)}`") for p in probs]
    cnt = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    j = cnt.crossJoin(F.broadcast(piv))
    # first bin whose hi bounds v (interior-edge ties go low); the last
    # edge is the max so every value lands somewhere
    bin_idx = None
    for i in range(n_bins, 0, -1):
        cond = F.col("v") <= cols[i]
        bin_idx = F.when(cond, F.lit(i - 1)) if bin_idx is None else F.when(
            cond, F.lit(i - 1)
        ).otherwise(bin_idx)
    # values above the top edge (possible only via float snap) clamp high
    bin_idx = F.coalesce(bin_idx, F.lit(n_bins - 1))
    return (
        j.select(bin_idx.alias("bin"), "cnt", *[c.alias(f"e{i}") for i, c in enumerate(cols)])
        .groupBy("bin")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            *[F.min(f"e{i}").alias(f"e{i}") for i in range(n_bins + 1)],
        )
        .select(
            "bin",
            *[],
            F.element_at(
                F.array(*[F.col(f"e{i}") for i in range(n_bins + 1)]),
                F.col("bin").cast("int") + 1,
            ).alias("lo"),
            F.element_at(
                F.array(*[F.col(f"e{i}") for i in range(n_bins + 1)]),
                F.col("bin").cast("int") + 2,
            ).alias("hi"),
            "n",
        )
    )


def concentration(df: DataFrame, key_col: str) -> DataFrame:
    """Activity-concentration profile over a key: one row (n_keys, total,
    gini, top1_share, top10_share, hhi) from the per-key count
    distribution — the skew readout that decides whether a corpus is
    dominated by a handful of sources/users (sampling quotas, the
    salting decision for the hot-key joins, dedup priorities). Gini from
    the closed form over ascending-sorted counts
    (2·Σ rank·cᵢ / (n·Σc) − (n+1)/n, rank ties broken by key for
    engine-stable ordering), HHI as Σ(share²). The groupBy exchange is
    bounded by distinct keys (map-side combine); the rank window runs
    over the aggregated relation only. All inputs to the float formulas
    are exact integer sums; outputs snap on the 1e-6 grid."""
    from pyspark.sql import Window

    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("c", "k")
    ranked = counts.withColumn("rk", F.row_number().over(w))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("total"),
        F.sum(F.col("rk").cast("bigint") * F.col("c")).alias("_src"),
        F.max("c").alias("_cmax"),
    )
    top10 = (
        ranked.withColumn(
            "drk", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("k")))
        )
        .where(F.col("drk") <= 10)
        .agg(F.sum("c").alias("_top10"))
    )
    hhi = counts.crossJoin(
        F.broadcast(counts.agg(F.sum("c").alias("_t")))
    ).agg(
        F.sum(
            (F.col("c").cast("double") / F.col("_t"))
            * (F.col("c").cast("double") / F.col("_t"))
        ).alias("_hhi")
    )
    n = F.col("n_keys").cast("double")
    tot = F.col("total").cast("double")
    gini = (F.lit(2.0) * F.col("_src").cast("double")) / (n * tot) - (
        n + F.lit(1.0)
    ) / n
    snap = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)  # noqa: E731
    return (
        agg.crossJoin(F.broadcast(top10))
        .crossJoin(F.broadcast(hhi))
        .select(
            "n_keys",
            "total",
            snap(gini).alias("gini"),
            snap(F.col("_cmax").cast("double") / tot).alias("top1_share"),
            snap(F.col("_top10").cast("double") / tot).alias("top10_share"),
            snap(F.col("_hhi")).alias("hhi"),
        )
    )
