"""Distribution-drift checks (north rule: KS on span-length, PSI on kind
frequencies).

Both are computed *distributively* — the only driver-side value is the final
scalar:

- KS: per-value (or per-bucket) counts → cumulative ECDFs via a window over
  the tiny aggregated relation → max |ΔECDF|. At 10^12 rows use ``n_buckets``
  so the windowed relation is bounded (the groupBy shuffles pre-aggregated
  partials only).
- PSI: two frequency vectors full-outer-joined on category with epsilon
  clipping, Σ (p−q)·ln(p/q).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ks_statistic", "psi"]

_EPS = 1e-6


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    *,
    n_buckets: int | None = 1024,
    exact: bool = False,
) -> DataFrame:
    """One row: (ks:double).

    DEFAULT is the bucketed ECDF (n_buckets=1024): the windowed relation is
    bounded at n_buckets rows regardless of input size, so the single-task
    cumulative window is O(n_buckets) — the only mode that survives 10^12
    rows. Pass exact=True (small/known cardinality only) for the per-distinct-
    value ECDF, whose window funnels every distinct value through one task."""
    if exact:
        n_buckets = None
    d = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(value_col).cast("double").alias("v"), F.col(group_col).alias("g")
    ).filter(F.col("v").isNotNull())

    if n_buckets is not None:
        # bucketed ECDF: bounded-cardinality aggregate, scale-safe
        bounds = d.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        d = d.crossJoin(F.broadcast(bounds)).withColumn(
            "v",
            F.least(
                F.lit(n_buckets - 1),
                F.floor((F.col("v") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / n_buckets + 1e-300)),
            ).cast("double"),
        ).select("v", "g")

    per_value = d.groupBy("v").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ecdf = per_value.select(
        (F.sum("ca").over(w)).alias("cum_a"),
        (F.sum("cb").over(w)).alias("cum_b"),
    )
    totals = per_value.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    return (
        ecdf.crossJoin(F.broadcast(totals))
        .select(F.abs(F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")).alias("d"))
        .agg(F.max("d").alias("ks"))
    )


def psi(
    df: DataFrame,
    category_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One row: (psi:double). Population Stability Index between two groups."""
    base = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(category_col).alias("cat"), F.col(group_col).alias("g")
    )
    freqs = base.groupBy("cat").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"),
    )
    totals = freqs.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    return (
        freqs.crossJoin(F.broadcast(totals))
        .select(
            F.greatest(F.col("ca") / F.col("na"), F.lit(_EPS)).alias("p"),
            F.greatest(F.col("cb") / F.col("nb"), F.lit(_EPS)).alias("q"),
        )
        .select(((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("term"))
        .agg(F.sum("term").alias("psi"))
    )
