"""Association-rule mining (support / confidence / lift) over per-entity
item baskets — the classic market-basket co-occurrence analysis, here over
"which event kinds does a user trigger" (or any (entity, item) relation).

Scale shape: the basket relation is `distinct (entity, item)` — ONE hash
exchange with map-side partial aggregation; the pair join is a self-join
ON THE ENTITY KEY of that already-deduped relation, so both sides reuse
the same partitioning (no second full exchange) and the per-entity pair
count is C(k, 2) with k ≤ the item vocabulary, NOT the raw event count.
Contract: the item vocabulary must be bounded (event kinds, category
tags — dozens to thousands); for open vocabularies pre-filter to the
top-m items, as every classic frequent-itemset system does.

All statistics are ratios of exact integer counts, so Spark and the SQL
oracle produce bit-identical doubles before the 1e-6 grid snap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["association_rules"]


def association_rules(
    df: DataFrame,
    entity_col: str,
    item_col: str,
    *,
    min_support: float = 0.0,
) -> DataFrame:
    """(antecedent, consequent, n_both, support, confidence, lift) for
    every ordered item pair co-occurring in at least one basket, both
    directions, filtered to support ≥ min_support.

    support    = n_both / n_entities
    confidence = n_both / n_antecedent
    lift       = confidence / (n_consequent / n_entities)
    """
    baskets = df.select(
        F.col(entity_col).alias("entity"), F.col(item_col).alias("item")
    ).distinct()
    totals = baskets.agg(F.countDistinct("entity").alias("n_entities"))
    item_counts = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a = baskets.select("entity", F.col("item").alias("ant"))
    b = baskets.select("entity", F.col("item").alias("con"))
    pairs = (
        a.join(b, "entity")
        .filter(F.col("ant") != F.col("con"))
        .groupBy("ant", "con")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    enriched = (
        pairs.join(
            F.broadcast(item_counts.select(F.col("item").alias("ant"), F.col("n_item").alias("n_ant"))),
            "ant",
        )
        .join(
            F.broadcast(item_counts.select(F.col("item").alias("con"), F.col("n_item").alias("n_con"))),
            "con",
        )
        .crossJoin(F.broadcast(totals))
    )
    n = F.col("n_entities").cast("double")
    support = F.col("n_both").cast("double") / n
    conf = F.col("n_both").cast("double") / F.col("n_ant").cast("double")
    lift = conf / (F.col("n_con").cast("double") / n)
    return (
        enriched.filter(support >= F.lit(float(min_support)))
        .select(
            F.col("ant").alias("antecedent"),
            F.col("con").alias("consequent"),
            "n_both",
            (F.floor(support * 1e6 + F.lit(1e-6)) / 1e6).alias("support"),
            (F.floor(conf * 1e6 + F.lit(1e-6)) / 1e6).alias("confidence"),
            (F.floor(lift * 1e6 + F.lit(1e-6)) / 1e6).alias("lift"),
        )
    )
