"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed n-gram feature
distribution looks like a TARGET corpus, by importance weight
log w(x) = Σ_features (log p̂_target[b] − log q̂_raw[b]) and Gumbel top-k
resampling.

This is the "make CommonCrawl look like Wikipedia" selection stage of
LLaMA/RedPajama-style pipelines, expressed as pure Spark aggregation:

- features: unigram + bigram buckets under the same md5 hashing trick as
  the quality classifier (`operators/quality_model.py`) — model size is
  bounded at n_buckets rows regardless of corpus vocabulary;
- fit: ONE explode + map-side-combining groupBy(bucket) over target∪raw
  (counts of both corpora in one pass), smoothed log-ratio per bucket —
  exactly the Naive-Bayes weight shape minus the class prior;
- score: explode → broadcast-join the ≤n_buckets-row model → one
  pre-combined exchanged row per doc;
- resample: the paper's Gumbel-top-k trick with a DETERMINISTIC
  engine-portable Gumbel g = −ln(−ln(u)), u derived from md5(doc id), so
  the selected set is reproducible and a DuckDB oracle replays it exactly.

Scale shape (10^12 docs): no self-joins, no windows; the only exchanges
are the bounded bucket-count agg, one row per doc for the score sum, and
a TakeOrdered for the final top-k (never a full sort shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import tokens

__all__ = [
    "hashed_ngram_features",
    "features_from_tokens",
    "fit_importance_model",
    "fit_importance_model_flagged",
    "importance_weights",
    "dsir_sample",
]

# u must stay strictly inside (0,1) for -ln(-ln(u)); 60-bit hash + half-ulp.
_TWO_60 = float(1 << 60)


def hashed_ngram_features(col: Column, n_buckets: int) -> Column:
    """array<long> of hashed unigram+bigram buckets, ALL occurrences kept
    (DSIR weights are count-based, unlike the dedup shingle sets).

    Bigrams ride the same zip_with-over-shifted-views single pass as
    `dedup.shingles` — no explode, no per-gram array copies. Bucket =
    first 15 md5 hex chars as a 60-bit integer mod n_buckets (DuckDB:
    ``CAST('0x' || substr(md5(g),1,15) AS BIGINT) % n_buckets``).

    NOTE: references the token array in ~5 HOF positions, and HOF lambdas
    defeat CSE — callers on the hot path should stage `tokens(col)` as an
    attribute first and use `features_from_tokens` (one split instead of
    five)."""
    return features_from_tokens(tokens(col), n_buckets)


def features_from_tokens(toks: Column, n_buckets: int) -> Column:
    """`hashed_ngram_features` over an already-staged token-array column."""
    uni = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        % F.lit(n_buckets),
    )
    pairs = F.zip_with(
        toks, F.slice(toks, 2, F.size(toks)), lambda a, b: F.concat_ws(" ", a, b)
    )
    bi = F.transform(
        F.slice(pairs, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        % F.lit(n_buckets),
    )
    return F.concat(uni, bi)


def fit_importance_model(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    *,
    n_buckets: int = 1 << 16,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Fit the per-bucket log importance ratio from a target corpus (what
    selected data should look like) and the raw corpus it is drawn from.

    Returns (weights, consts), both lazy:
    - weights: (bucket:long, lr:double) for every bucket SEEN in either
      corpus: lr = ln((c_t+α)/(T_t+αB)) − ln((c_r+α)/(T_r+αB));
    - consts: ONE row (lr_default:double) — the ratio of a bucket unseen
      in both corpora (the two α-floors; cancels to a constant shift).

    One union + explode + groupBy(bucket): both corpora are counted in a
    single map-side-combining aggregation bounded at n_buckets rows."""
    ev = _staged_events(target, F.lit(True), text_col, n_buckets).unionByName(
        _staged_events(raw, F.lit(False), text_col, n_buckets)
    )
    cnt = ev.groupBy("b").agg(
        F.sum(F.when(F.col("t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("t"), 1).otherwise(0)).alias("cr"),
    )
    return _model_from_counts(cnt, n_buckets=n_buckets, alpha=alpha)


def fit_importance_model_flagged(
    df: DataFrame,
    target_flag: Column,
    text_col: str,
    *,
    n_buckets: int = 1 << 16,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """`fit_importance_model` for the common case where the target corpus is
    a FLAGGED SUBSET of the raw corpus (e.g. the trusted source among crawl
    sources). Identical model to fit(target=df.filter(flag), raw=df) — the
    target's feature count rides the same rows as the raw count — but the
    corpus text is tokenized/hashed ONCE instead of twice (flagged docs are
    not re-scanned through a union branch)."""
    ev = _staged_events(df, target_flag, text_col, n_buckets)
    cnt = ev.groupBy("b").agg(
        F.sum(F.when(F.col("t"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    return _model_from_counts(cnt, n_buckets=n_buckets, alpha=alpha)


def _staged_events(df: DataFrame, flag: Column, text_col: str, n_buckets: int) -> DataFrame:
    """(t:boolean, b:long) feature-occurrence events with the token array
    staged as an attribute first — one split per doc, not one per HOF."""
    return df.select(
        flag.alias("t"), tokens(F.col(text_col)).alias("__toks")
    ).select("t", F.explode(features_from_tokens(F.col("__toks"), n_buckets)).alias("b"))


def _model_from_counts(
    cnt: DataFrame, *, n_buckets: int, alpha: float
) -> tuple[DataFrame, DataFrame]:
    # the count relation is bounded at n_buckets rows by construction —
    # persisting it means the corpus-wide feature scan runs ONCE, not once
    # per derived broadcast (weights + consts each force the DAG otherwise)
    cnt = cnt.persist()
    tot = cnt.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    v = F.lit(float(n_buckets))
    a = F.lit(float(alpha))
    weights = cnt.crossJoin(F.broadcast(tot)).select(
        F.col("b").alias("bucket"),
        (
            F.log((F.col("ct") + a) / (F.col("tt") + a * v))
            - F.log((F.col("cr") + a) / (F.col("tr") + a * v))
        ).alias("lr"),
    )
    consts = tot.select(
        (
            F.log(a / (F.col("tt") + a * v)) - F.log(a / (F.col("tr") + a * v))
        ).alias("lr_default")
    )
    return weights, consts


def importance_weights(
    df: DataFrame,
    weights: DataFrame,
    consts: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 1 << 16,
) -> DataFrame:
    """(id, logw): per-document log importance weight Σ lr[bucket(feature)].
    Docs whose every feature is unseen (or with no tokens) still get a row
    (empty feature set ⇒ logw = 0.0 like the paper's empty product).

    Broadcast-joins the bounded model; one exchanged row per doc."""
    ev = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    ).select(
        "id",
        F.explode_outer(features_from_tokens(F.col("__toks"), n_buckets)).alias("b"),
    )
    joined = ev.join(
        F.broadcast(weights), ev["b"] == weights["bucket"], "left"
    ).crossJoin(F.broadcast(consts))
    return (
        joined.select(
            "id",
            F.when(F.col("b").isNull(), F.lit(0.0))
            .otherwise(F.coalesce(F.col("lr"), F.col("lr_default")))
            .alias("w"),
        )
        .groupBy("id")
        .agg(F.sum("w").alias("logw"))
    )


def gumbel_key(id_col: Column, logw: Column) -> Column:
    """The paper's Gumbel-top-k trick, derandomized: key = logw + g where
    g = −ln(−ln(u)) and u = (60-bit md5(id) + 0.5) / 2^60 ∈ (0,1). Top-k
    by key is a without-replacement sample ∝ w(x); the md5-derived u makes
    the draw reproducible and replayable by any engine with md5."""
    u = (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(_TWO_60)
    return logw + -F.log(-F.log(u))


def dsir_sample(
    df: DataFrame,
    target: DataFrame | None,
    id_col: str,
    text_col: str,
    k: int,
    *,
    n_buckets: int = 1 << 16,
    alpha: float = 1.0,
    target_flag: Column | None = None,
) -> DataFrame:
    """End-to-end DSIR: fit the importance model on (target, df), weight
    every doc in df, Gumbel-resample k winners. Returns
    (id, logw, key) for the selected docs, deterministic tiebreak
    (key DESC, id ASC). The final top-k lowers to TakeOrdered — no full
    sort shuffle at any corpus size.

    Pass target_flag (a boolean Column over df) instead of a separate
    target frame when the target is a subset of the corpus — one fewer
    tokenize+hash pass over the flagged docs."""
    if (target is None) == (target_flag is None):
        raise ValueError("pass exactly one of target / target_flag")
    if target_flag is not None:
        weights, consts = fit_importance_model_flagged(
            df, target_flag, text_col, n_buckets=n_buckets, alpha=alpha
        )
    else:
        weights, consts = fit_importance_model(
            target, df, text_col, n_buckets=n_buckets, alpha=alpha
        )
    w = importance_weights(
        df, weights, consts, id_col, text_col, n_buckets=n_buckets
    )
    keyed = w.select(
        "id", "logw", gumbel_key(F.col("id"), F.col("logw")).alias("key")
    )
    return keyed.orderBy(F.col("key").desc(), F.col("id").asc()).limit(k)
