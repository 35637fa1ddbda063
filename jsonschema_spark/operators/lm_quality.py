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

__all__ = ["fit_unigram_lm", "perplexity_scores"]


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
