"""Full-text relevance (BM25) and hybrid keyword+vector retrieval (RRF).

The retrieval surface a training-data / RAG corpus pipeline needs next to
ANN: score documents against a keyword query with Okapi BM25, and fuse a
keyword ranking with an embedding-similarity ranking via Reciprocal Rank
Fusion (Cormack et al., SIGIR'09) — the standard hybrid-search recipe.

Scale shape (both operators, 10^12-doc corpus):

- `bm25_topk` never explodes tokens and never shuffles the corpus. For a
  SMALL fixed query-term set (|Q| ≤ ~32, documented contract) per-document
  term frequencies are array-filter projections over the token array —
  O(S·|Q|) per doc, zero exchanges. Corpus statistics (N, avgdl, per-term
  document frequency) reduce to ONE map-side-combining aggregate emitting a
  single row, broadcast back into the scoring projection. The final top-k
  is TakeOrdered (orderBy+limit ⇒ per-partition heaps + driver merge of k
  rows), never a global sort.
- `rrf_fuse` joins rank lists that are already ≤ depth rows each; with
  depth ≪ corpus the join inputs are tiny and broadcast under AQE.

Cross-engine float discipline: document length, term frequency, N and df
are exact integers in both engines; every double is derived from them by
the same explicit expression tree (the per-term score sum is an explicit
left-to-right chain, not a re-orderable aggregate), so Spark and the
DuckDB oracle produce bit-identical doubles and the (score DESC, id ASC)
top-k cut is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import tokens

__all__ = ["bm25_topk", "rrf_fuse"]


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Okapi BM25 top-k: (id, score, rank) for the `top_k` highest-scoring
    documents against a bag of query terms.

    idf_t = ln(1 + (N - df_t + 0.5)/(df_t + 0.5)) (the non-negative Lucene
    variant); score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)).
    Ties broken by id ASC. Documents matching no term score 0 and are
    filtered out before the top-k cut.
    """
    if not query_terms:
        raise ValueError("bm25_topk: need at least one query term")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("bm25_topk: query terms must be distinct")
    def _tf(term: str):
        # single-arg lambda: a 2-arg lambda would receive the array INDEX
        # as its second argument and shadow the term binding
        return F.size(F.filter(F.col("_toks"), lambda x: x == F.lit(term)))

    staged = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks")
    ).select(
        "id",
        F.size("_toks").alias("dl"),
        *[_tf(t).alias(f"_tf{i}") for i, t in enumerate(query_terms)],
    )
    # One map-side-combining aggregate for every corpus statistic: N, total
    # doc length (avgdl = exact-int sum / exact-int count), df per term.
    stats = staged.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_dl_sum"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("bigint")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = staged.crossJoin(F.broadcast(stats))
    avgdl = F.col("_dl_sum").cast("double") / F.col("_n").cast("double")
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
    )
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n").cast("double") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}").cast("double") + F.lit(0.5))
        )
        tf = F.col(f"_tf{i}").cast("double")
        score = score + idf * tf * F.lit(float(k1) + 1.0) / (tf + norm)
    out = scored.select("id", score.alias("score")).filter(F.col("score") > 0)
    top = out.orderBy(F.desc("score"), F.asc("id")).limit(int(top_k))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return top.select(
        "id",
        (F.floor(F.col("score") * 1e6 + F.lit(1e-6)) / 1e6).alias("score"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "id",
    rank_col: str = "rank",
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion over ≥2 rank lists: rrf(id) = Σ_r 1/(k+rank_r)
    for every list containing id (absent lists contribute 0 — the standard
    union semantics). Returns (id, rrf_score, rank) for the fused top-k,
    ties by id ASC.

    Inputs are rank lists (depth ≤ a few hundred rows), so the outer joins
    and the final sort are on tiny relations regardless of corpus size.
    """
    if len(rankings) < 2:
        raise ValueError("rrf_fuse: need at least two rankings")
    fused = None
    for i, r in enumerate(rankings):
        part = r.select(
            F.col(id_col).alias("id"), F.col(rank_col).alias(f"_r{i}")
        )
        fused = part if fused is None else fused.join(part, "id", "full_outer")
    contrib = [
        F.when(
            F.col(f"_r{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"_r{i}").cast("double")),
        ).otherwise(F.lit(0.0))
        for i in range(len(rankings))
    ]
    score = contrib[0]
    for c in contrib[1:]:
        score = score + c
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("_s"), F.asc("id"))
    return (
        fused.select("id", score.alias("_s"))
        .orderBy(F.desc("_s"), F.asc("id"))
        .limit(int(top_k))
        .select(
            "id",
            (F.floor(F.col("_s") * 1e6 + F.lit(1e-6)) / 1e6).alias("rrf_score"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
    )
