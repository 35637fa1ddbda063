"""Unigram language-model perplexity scoring (CCNet-style quality signal).

Web-scale curation pipelines score crawl text with a language model trained
on a trusted corpus and drop the high-perplexity tail (CCNet; Gopher uses
the same signal family). This is the Spark-first unigram variant: the model
is a bounded top-V vocabulary with add-one smoothing, fit as a token-count
aggregation, and scoring is a broadcast hash join — no Python in either
path.

Scale design (100 TB):
- fit: explode -> groupBy(token) has map-side partial aggregation, so the
  shuffle carries one (token, cnt) row per partition per distinct token,
  not one row per token occurrence. The top-V cut runs as TakeOrdered
  (per-partition top-V, then a single reduce) — no global sort shuffle.
- score: the model is at most `vocab_size` rows and broadcast; the only
  shuffle is the final groupBy(doc) whose partial aggregation collapses
  token rows map-side (exploded tokens of a doc stay in one partition).
- The smoothing denominator uses the ACTUAL kept vocabulary size K
  (K = min(vocab_size, distinct tokens)), so small fixture corpora and the
  DuckDB oracle agree exactly.

Model relation contract: (token string, logp double) for the vocabulary,
plus ONE row with token = NULL carrying the out-of-vocabulary log-prob.

Reference scope note: kaptinlin/jsonschema has no LM scoring — this is part
of the beyond-reference training-data-pipeline surface (SURVEY.md §2.8+).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import tokens

__all__ = [
    "fit_unigram_lm",
    "perplexity_scores",
    "fit_bigram_lm",
    "bigram_perplexity_scores",
]


def fit_unigram_lm(corpus: DataFrame, text_col: str, *, vocab_size: int = 4096) -> DataFrame:
    """Fit a smoothed unigram LM over `corpus[text_col]`.

    Returns (token, logp) for the top-`vocab_size` tokens (count desc,
    token asc — deterministic tie-break) plus one token-NULL row with the
    OOV log-prob. Add-one smoothing over the full token mass:
    p(t) = (cnt_t + 1) / (total + K + 1), p(oov) = 1 / (total + K + 1)
    where total counts EVERY token occurrence (in- or out-of-vocab) and K
    is the kept vocabulary size.
    """
    counts = (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # tiny aggregated relations: total token mass (1 row) and the kept
    # vocabulary (<= vocab_size rows, TakeOrdered — no global sort)
    totals = counts.agg(F.sum("cnt").alias("total"))
    vocab = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(vocab_size)
    kept = vocab.agg(F.count(F.lit(1)).alias("kept"))
    denom = F.log((F.col("total") + F.col("kept") + F.lit(1)).cast("double"))
    in_vocab = (
        vocab.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(kept))
        .select(
            "token",
            (F.log((F.col("cnt") + F.lit(1)).cast("double")) - denom).alias("logp"),
        )
    )
    oov = (
        totals.crossJoin(F.broadcast(kept))
        .select(F.lit(None).cast("string").alias("token"), (-denom).alias("logp"))
    )
    return in_vocab.unionByName(oov)


def perplexity_scores(
    df: DataFrame, id_col: str, text_col: str, model: DataFrame
) -> DataFrame:
    """Score each doc against a fitted model: (id, n_tokens, n_oov,
    perplexity) with perplexity = exp(-(1/n) * sum ln p(t_i)), rounded to 6
    decimals (cross-engine float jitter is ~1e-11 — see histogram oracle
    precedent). The model relation is broadcast; the only shuffle is the
    per-doc aggregation (partial map-side)."""
    vocab = model.filter(F.col("token").isNotNull())
    oov = model.filter(F.col("token").isNull()).select(F.col("logp").alias("__oov_logp"))
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    scored = (
        exploded.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("logp").isNull().cast("bigint")).alias("n_oov"),
            F.sum(F.coalesce(F.col("logp"), F.col("__oov_logp"))).alias("__ll"),
        )
    )
    return scored.select(
        "id",
        "n_tokens",
        "n_oov",
        F.round(F.exp(-F.col("__ll") / F.col("n_tokens")), 6).alias("perplexity"),
    )


def fit_bigram_lm(
    corpus: DataFrame,
    text_col: str,
    *,
    vocab_size: int = 4096,
    bigram_size: int = 8192,
) -> tuple[DataFrame, DataFrame]:
    """Fit the bigram layer on top of the unigram model: returns
    (unigram_model, bigram_model) where the bigram relation is
    (w1, w2, pml double) for the top-`bigram_size` bigrams by count
    (count desc, (w1, w2) asc — deterministic) with
    pml = c(w1,w2) / c(w1·) — the maximum-likelihood conditional against the
    FULL context count (computed before the top-B cut, so truncation only
    drops rows, never changes a kept probability).

    Scale shape mirrors the unigram fit: the bigram groupBy has map-side
    partial aggregation (one row per partition per distinct bigram through
    the exchange), context counts are a second small agg OVER the bigram
    count relation (not a rescan of the corpus), and the top-B cut is a
    TakeOrdered. Both returned relations are bounded (≤ vocab_size + 1,
    ≤ bigram_size rows) — broadcast them at scoring time.
    """
    from jsonschema_spark.operators.dedup import tokens as _tokens

    uni = fit_unigram_lm(corpus, text_col, vocab_size=vocab_size)
    toks = corpus.select(_tokens(F.col(text_col)).alias("__t"))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                F.slice(F.col("__t"), 2, F.greatest(F.size("__t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    top = counts.orderBy(
        F.col("c12").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(bigram_size)
    bi = top.join(F.broadcast(ctx), "w1").select(
        "w1", "w2", (F.col("c12").cast("double") / F.col("c1")).alias("pml")
    )
    return uni, bi


def bigram_perplexity_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    unigram_model: DataFrame,
    bigram_model: DataFrame,
    *,
    interp: float = 0.75,
) -> DataFrame:
    """Interpolated-bigram perplexity (Jelinek-Mercer, KenLM-style order-2):
    per token position i>0, p = interp·pml(w_{i-1}, w_i) + (1−interp)·
    p_uni(w_i) (pml = 0 when the bigram is outside the model), and the first
    token scores p_uni alone. Returns (id, n_tokens, n_hits, perplexity)
    where n_hits counts positions whose bigram was in the model.

    One explode (position rows carry (w1, w2); the first token rides as a
    w1-NULL row so the whole doc scores in a single pass), two broadcast
    hash joins (bigram on (w1, w2), unigram on w2 with the OOV fallback
    row), one map-side-combining per-doc aggregation — the same exchange
    profile as the unigram scorer.
    """
    from jsonschema_spark.operators.dedup import tokens as _tokens

    vocab = unigram_model.filter(F.col("token").isNotNull())
    oov = unigram_model.filter(F.col("token").isNull()).select(
        F.col("logp").alias("__oov_logp")
    )
    staged = df.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__t")
    )
    rows = staged.select(
        "id",
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.lit(None).cast("string").alias("w1"),
                        F.element_at("__t", 1).alias("w2"),
                    )
                ),
                F.zip_with(
                    F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                    F.slice(F.col("__t"), 2, F.greatest(F.size("__t") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            )
        ).alias("p"),
    ).select("id", "p.w1", "p.w2")
    lam = F.lit(float(interp))
    scored = (
        rows.join(F.broadcast(bigram_model), ["w1", "w2"], "left")
        .join(
            F.broadcast(vocab.withColumnRenamed("token", "w2")), "w2", "left"
        )
        .crossJoin(F.broadcast(oov))
        .withColumn("__puni", F.exp(F.coalesce(F.col("logp"), F.col("__oov_logp"))))
        .withColumn(
            "__lp",
            F.when(F.col("w1").isNull(), F.log("__puni")).otherwise(
                F.log(
                    lam * F.coalesce(F.col("pml"), F.lit(0.0))
                    + (F.lit(1.0) - lam) * F.col("__puni")
                )
            ),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("pml").isNotNull().cast("bigint")).alias("n_hits"),
            F.sum("__lp").alias("__ll"),
        )
    )
    return scored.select(
        "id",
        "n_tokens",
        "n_hits",
        F.round(F.exp(-F.col("__ll") / F.col("n_tokens")), 6).alias("perplexity"),
    )
