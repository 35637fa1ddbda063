"""Greedy maximum-coverage data selection — "pick the k documents that
together cover the most distinct content" (shingle coverage), the
submodular-selection shape behind coverage-based training-subset curation
(facility-location / max-coverage objectives; the greedy algorithm is the
classic (1 - 1/e)-approximation, Nemhauser et al. 1978).

Scale shape: ONE corpus-sized pass builds the distinct (doc, shingle)
relation, checkpointed and reused every round. A round is
- anti-join the pair relation against the covered-shingle set (16-byte
  digests, never text),
- a map-side-combining groupBy(doc) for marginal gains,
- a 1-row TakeOrdered argmax collect (gain desc, id asc — deterministic),
- union the winner's shingles into the covered set, localCheckpoint.
Per-round exchange cost shrinks monotonically (covered shingles leave the
relation); rounds are a fixed small k, so lineage and shuffle count are
bounded. No pair×pair product anywhere.

Reference analogue: none (training-data pipeline extension, task spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.operators.dedup import shingles

__all__ = ["greedy_cover"]

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("gain", T.LongType(), False),
        T.StructField("covered_total", T.LongType(), False),
    ]
)


def greedy_cover(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    shingle_n: int = 3,
) -> DataFrame:
    """(round, doc_id, gain, covered_total): the k greedily-selected
    documents, each with its marginal new-shingle count and the running
    distinct-coverage total. Shingles are md5-digested before any
    exchange."""
    spark = df.sparkSession
    pairs = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("s"),
        )
        .select("id", F.md5(F.col("s")).alias("sh"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out: list[tuple] = []
    covered_total = 0
    remaining = pairs
    for r in range(int(k)):
        gains = remaining.groupBy("id").agg(F.count(F.lit(1)).alias("gain"))
        best = gains.orderBy(F.desc("gain"), "id").limit(1).collect()
        if not best or best[0]["gain"] == 0:
            break
        bid, gain = best[0]["id"], int(best[0]["gain"])
        covered_total += gain
        out.append((r, int(bid), gain, covered_total))
        if r < k - 1:
            won = remaining.where(F.col("id") == bid).select("sh")
            remaining = (
                remaining.where(F.col("id") != bid)
                .join(won, "sh", "left_anti")
                .localCheckpoint(eager=True)
            )
    return spark.createDataFrame(out, _OUT_SCHEMA)
