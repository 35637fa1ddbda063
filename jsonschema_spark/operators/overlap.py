"""Cross-corpus overlap estimation via bottom-k (KMV) shingle sketches.

"How much does source A's text overlap source B's?" is the question behind
mixture design, contamination audits between corpus snapshots, and
licensing provenance checks. Exact shingle-set Jaccard between two
multi-TB sources needs a distinct-shingle join whose cost is the corpus;
the k-minimum-values sketch (Bar-Yossef et al. 2002; Beyer et al. 2007
"distinct-value synopses") answers it from k rows per source:

    sketch(S)  = the k smallest 60-bit shingle hashes of source S
    X          = the k smallest hashes of sketch(A) ∪ sketch(B)
    Jaccard    ≈ |{x ∈ X : x ∈ sketch(A) ∧ x ∈ sketch(B)}| / |X|

because the bottom-k of a uniform hash is a size-k uniform sample of the
UNION's distinct shingles, and membership in both sketches is membership
in the intersection for every element of X (bottom-k of the union is a
subset of each side's bottom-k restricted to its elements). Standard
error ~ 1/sqrt(k).

Scale shape (the reason to sketch at all):

- shingles are built row-locally (`dedup.shingles` — zip_with shifted
  views, no explode until the hash rows);
- the only corpus-sized exchange is the distinct (source, hash) groupBy,
  which partial-aggregates map-side;
- bottom-k per source is TWO bounded rank windows: phase 1 ranks inside
  (source, hash % buckets) so a billion-document source costs `buckets`
  bounded sorts instead of one giant one (the `group_quota` salting
  trick — bottom-k is distributive, so per-bucket bottom-k then global
  bottom-k is exact); phase 2 re-ranks the ≤ k·buckets survivors;
- everything after the sketch is k·|sources| rows — driver-scale.

Hashes come from `dedup.md5_hash60` so every step is engine-portable and
the DuckDB oracle replays the sketch bit-for-bit. Estimates snap to the
1e-6 grid with nudge-then-floor (round() has engine-divergent tie
semantics).

Reference analogue: none (training-data pipeline extension, task spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import md5_hash60, shingles

__all__ = ["source_sketches", "source_overlap"]


def source_sketches(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    k: int = 128,
    shingle_n: int = 3,
    buckets: int = 16,
) -> DataFrame:
    """(grp, h): the k smallest distinct shingle hashes per group."""
    if k <= 0:
        raise ValueError("k must be positive")
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("s"),
    ).select("grp", md5_hash60(F.col("s")).alias("h"))
    distinct = hashed.groupBy("grp", "h").agg(F.count(F.lit(1)).alias("__n")).drop("__n")
    w1 = Window.partitionBy("grp", "__b").orderBy("h")
    phase1 = (
        distinct.withColumn("__b", F.pmod(F.col("h"), F.lit(buckets)))
        .withColumn("__r", F.row_number().over(w1))
        .filter(F.col("__r") <= k)
        .drop("__r", "__b")
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    return (
        phase1.withColumn("__r", F.row_number().over(w2))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def source_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    k: int = 128,
    shingle_n: int = 3,
    buckets: int = 16,
) -> DataFrame:
    """Pairwise estimated shingle-Jaccard between all groups.

    Returns (src_a, src_b, n_union, n_both, jaccard_est) for every group
    pair src_a < src_b: n_union = |X| (= min(k, distinct hashes of the
    merged sketches)), n_both = how many of X sit in both sketches,
    jaccard_est = n_both / n_union snapped to 1e-6.

    The pair join runs over the k-rows-per-group sketch relation, never the
    corpus: with G groups it is ≤ G·(G−1)/2 · 2k rows — driver-scale even
    at thousands of sources."""
    sk = source_sketches(
        df, group_col, text_col, k=k, shingle_n=shingle_n, buckets=buckets
    )
    groups = sk.select("grp").distinct()
    pairs = (
        groups.alias("a")
        # broadcast keeps the G x G pair enumeration a BroadcastNestedLoop
        # over the tiny distinct-group relation, never a shuffled
        # CartesianProduct
        .join(F.broadcast(groups.alias("b")), F.col("a.grp") < F.col("b.grp"))
        .select(F.col("a.grp").alias("src_a"), F.col("b.grp").alias("src_b"))
    )
    # OR-membership join: each sketch row lands in every pair naming its
    # group. Pairs are tiny (G²/2 rows) — broadcast them so the sketch side
    # never shuffles.
    m = F.broadcast(pairs).join(
        sk, (sk["grp"] == pairs["src_a"]) | (sk["grp"] == pairs["src_b"])
    )
    merged = m.groupBy("src_a", "src_b", "h").agg(
        F.max((F.col("grp") == F.col("src_a")).cast("int")).alias("in_a"),
        F.max((F.col("grp") == F.col("src_b")).cast("int")).alias("in_b"),
    )
    w = Window.partitionBy("src_a", "src_b").orderBy("h")
    bottom = merged.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= k
    )
    est = bottom.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_both"),
    )
    jaccard = (
        F.floor(
            F.col("n_both").cast("double")
            / F.col("n_union").cast("double")
            * F.lit(1e6)
            + F.lit(1e-6)
        )
        / F.lit(1e6)
    )
    return est.select(
        "src_a", "src_b", "n_union", "n_both", jaccard.alias("jaccard_est")
    )
