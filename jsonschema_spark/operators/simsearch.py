"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline — broadcast the (small) query set,
  `zip_with`+`aggregate` dot products JVM-side, window top-k per query.
- LSH-bucketed ANN: deterministic random-hyperplane signatures (hash-derived
  pseudo-projections, no stored model) bucket the corpus; queries probe only
  their bucket — the 100 TB path where the cross product is infeasible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_similarity", "brute_force_topk", "hyperplane_signature", "ann_topk", "cosine_near_dup_pairs", "ivf_topk"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact top-k per query.

    The query side is broadcast (small); the corpus is scanned once, no
    shuffle until the per-query top-k aggregation.
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    sim = cosine_similarity(F.col(vec_col), F.col(query_vec_col))
    scored = joined.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        sim.alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


_MAX_LSH_DIM = 1024


def _plane_signs(p: int, dim: int = _MAX_LSH_DIM) -> list[float]:
    """Deterministic ±1 normal for plane p (sha256-derived; no stored model)."""
    import hashlib

    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.sha256(f"{p}:{i}".encode()).digest()
        out.extend(1.0 if b & 1 else -1.0 for b in h)
        i += 1
    return out[:dim]


def hyperplane_signature(vec: Column, *, n_planes: int = 16, dim: int | None = None) -> Column:
    """Deterministic random-hyperplane LSH signature (int bitmask).

    The ±1 sign matrix is a compile-time constant, generated driver-side and
    inlined as literal arrays (computing it per row via hash expressions cost
    n_planes x dim hashes PER ROW — measured the dominant LSH cost)."""
    def plane_bit(p: int) -> Column:
        signs = F.slice(
            F.lit(_plane_signs(p, dim or _MAX_LSH_DIM)), 1, F.size(vec)
        )
        proj = F.aggregate(
            F.zip_with(vec, signs, lambda x, r: x * r),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))

    sig = plane_bit(0)
    for p in range(1, n_planes):
        sig = sig + plane_bit(p)
    return sig


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
    n_planes: int = 12,
) -> DataFrame:
    """Approximate top-k: join on LSH bucket, exact cosine within bucket.

    Recall is tunable via n_planes (fewer planes → bigger buckets → higher
    recall, more compute). At scale, bucket the corpus ONCE (write bucketed
    parquet/Iceberg clustered by signature) and probe per query.
    """
    c = corpus.withColumn("__sig", hyperplane_signature(F.col(vec_col), n_planes=n_planes))
    q = queries.withColumn("__sig", hyperplane_signature(F.col(query_vec_col), n_planes=n_planes))
    joined = c.join(F.broadcast(q), "__sig")
    sim = cosine_similarity(F.col(vec_col), F.col(query_vec_col))
    scored = joined.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        sim.alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine >= threshold).

    Scale path: candidates bucket on the random-hyperplane signature (near-
    identical vectors share all sign bits with high probability), exact cosine
    verifies within buckets — the embedding analogue of MinHash+LSH dedup."""
    sig = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        hyperplane_signature(F.col(vec_col), n_planes=n_planes).alias("sig"),
    )
    a = sig.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "sig")
    b = sig.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "sig")
    pairs = a.join(b, "sig").filter(F.col("id_a") < F.col("id_b"))
    cos = cosine_similarity(F.col("vec_a"), F.col("vec_b"))
    return pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into n_cells inverted
    lists, search only the n_probe closest cells per query.

    Deterministic coarse centroids: the n_cells corpus vectors with the
    smallest ids (a seeded sample at scale; the partition/assignment shape —
    broadcast centroids, cell-pruned join — is what matters, the quantizer is
    pluggable). Queries: (query_id, query_vec)."""
    centroids = (
        emb.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
    )
    cent = F.broadcast(centroids)

    # corpus assignment: argmax-dot centroid per vector (broadcast join + rank)
    corpus_cells = (
        emb.crossJoin(cent)
        .select(
            id_col,
            vec_col,
            "cent_id",
            cosine_similarity(F.col(vec_col), F.col("cent_vec")).alias("_aff"),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("_aff"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("_rk") == 1)
        .select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("corpus_vec"), F.col("cent_id").alias("cell"))
    )
    # query probes: n_probe closest cells per query
    query_cells = (
        queries.crossJoin(cent)
        .select(
            "query_id",
            "query_vec",
            "cent_id",
            cosine_similarity(F.col("query_vec"), F.col("cent_vec")).alias("_aff"),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("_aff"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "query_vec", F.col("cent_id").alias("cell"))
    )
    scored = query_cells.join(corpus_cells, "cell").select(
        "query_id",
        F.col("corpus_id").alias("neighbor_id"),
        cosine_similarity(F.col("query_vec"), F.col("corpus_vec")).alias("cosine"),
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select("query_id", "neighbor_id", "rank", "cosine")
