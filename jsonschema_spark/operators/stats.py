"""Per-column statistics + cardinality (north rule: min/max/null-rate, HLL).

All built-in Spark aggregates: partial (map-side) + final hash aggregation,
one shuffle of pre-aggregated partials — scales linearly with executors.
HLL sketches via ``hll_sketch_agg`` (Spark 3.5+) are mergeable per-partition
states, checkpointable for resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_stats", "column_cardinality", "robust_outliers"]


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

    Plan: three chained aggregation passes (median; MAD given median;
    outlier counts given both), each a full-column scan with map-side
    partial aggregation, stitched by broadcast one-row crossJoins so
    nothing collects driver-side. Exact `percentile` (type-7, matches
    DuckDB/Postgres quantile_cont — see operators/profile.py) keeps oracle
    parity; at 10^12 rows swap `approx_percentile` in pass 1/2 and the
    counting pass is unchanged. med/mad are snapped to the 1e-6 grid
    (nudge-then-floor) BEFORE the threshold compare, so the decision
    boundary is the same IEEE double in every engine.
    """
    med_row = df.agg(
        *[_snap6(F.percentile(F.col(c), F.lit(0.5))).alias(f"__med_{c}") for c in columns]
    )
    j1 = df.crossJoin(F.broadcast(med_row))
    mad_row = j1.agg(
        *(
            [
                _snap6(
                    F.percentile(F.abs(F.col(c) - F.col(f"__med_{c}")), F.lit(0.5))
                ).alias(f"__mad_{c}")
                for c in columns
            ]
            + [F.min(f"__med_{c}").alias(f"__med_{c}") for c in columns]
        )
    )
    j2 = df.crossJoin(F.broadcast(mad_row))
    aggs = []
    for c in columns:
        med, mad = F.col(f"__med_{c}"), F.col(f"__mad_{c}")
        aggs.append(F.count(c).alias(f"np__{c}"))
        aggs.append(
            F.sum(
                F.when(F.abs(F.col(c) - med) > F.lit(float(k)) * mad, 1).otherwise(0)
            ).alias(f"no__{c}")
        )
        aggs.append(F.min(med).alias(f"md__{c}"))
        aggs.append(F.min(mad).alias(f"ma__{c}"))
    wide = j2.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', `np__{c}`, `md__{c}`, `ma__{c}`, `no__{c}`" for c in columns
    )
    return wide.selectExpr(
        f"stack({len(columns)}, {stack_expr}) as (column, n_present, med, mad, n_outliers)"
    )
