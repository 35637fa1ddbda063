"""Referential integrity: FK column → dimension catalog (north rule:
media_ref → media_catalog).

Physical strategy: LEFT ANTI join. When the catalog is broadcastable we hint
``broadcast`` (no shuffle of the fact side at all); otherwise AQE picks
broadcast vs sort-merge at runtime from actual sizes, and its skew-join
splitting handles hot FK values. Violations come back as rows, mirroring the
reference's violation list (reference: result.go ToList).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["referential_violations", "referential_check"]


def referential_violations(
    fact: DataFrame,
    fk: str,
    dim: DataFrame,
    pk: str,
    *,
    broadcast_dim: bool | None = None,
) -> DataFrame:
    """Rows of ``fact`` whose non-null ``fk`` has no match in ``dim.pk``."""
    d = dim.select(F.col(pk).alias(fk)).distinct()
    if broadcast_dim is True:
        d = F.broadcast(d)
    return fact.filter(F.col(fk).isNotNull()).join(d, on=fk, how="left_anti")


def referential_check(
    fact: DataFrame,
    fk: str,
    dim: DataFrame,
    pk: str,
    *,
    broadcast_dim: bool | None = None,
) -> DataFrame:
    """One verdict row (check_name, passed, statistic=dangling count, threshold)."""
    dangling = referential_violations(fact, fk, dim, pk, broadcast_dim=broadcast_dim).agg(
        F.count(F.lit(1)).alias("n")
    )
    return dangling.select(
        F.lit(f"referential:{fk}").alias("check_name"),
        (F.col("n") == 0).alias("passed"),
        F.col("n").cast("double").alias("statistic"),
        F.lit(0.0).alias("threshold"),
    )
