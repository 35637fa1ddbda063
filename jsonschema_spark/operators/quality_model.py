"""Trainable model-based quality filter: a hashed bag-of-tokens Naive-Bayes
log-odds classifier — the cheap fastText-style scorer LLM data pipelines run
after heuristic filters (CCNet/GPT-3/LLaMA-style "quality classifier" stage,
here as pure Spark aggregation with no ML-runtime dependency).

Training IS one aggregation: per-bucket token counts in each class turn into
log-odds weights w_b = ln((c⁺_b+α)/(T⁺+αV)) − ln((c⁻_b+α)/(T⁻+αV)); scoring
is explode → broadcast-join weights → per-doc sum (+ class-prior bias) —
the same proven plan shape as the CCNet perplexity scorer
(`operators/lm_quality.py`): token rows of a doc never leave their input
partition, so the per-doc sum is map-side complete except one exchanged row
per doc, and the hashing trick bounds the broadcast model at n_buckets rows
(2^18 × 16 B ≈ 4 MB) no matter how large the corpus vocabulary grows.

Everything is engine-portable (md5-derived bucket hash, integer-count ratios
under ln) so a DuckDB oracle recomputes scores exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import tokens

__all__ = [
    "hashed_token_buckets",
    "fit_nb_quality_model",
    "score_quality_model",
    "binary_auc_bucketed",
    "threshold_pick_bucketed",
    "calibration_deciles_bucketed",
]


def hashed_token_buckets(col: Column, n_buckets: int) -> Column:
    """array<long> of hashed-feature buckets for each token: first 15 hex
    chars of md5 as a 60-bit non-negative integer, mod n_buckets (DuckDB:
    ``CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % n_buckets``)."""
    return F.transform(
        tokens(col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        % F.lit(n_buckets),
    )


def fit_nb_quality_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    *,
    n_buckets: int = 1 << 18,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Fit the classifier from boolean weak labels (`label_col`: true ⇒
    positive/high-quality — e.g. "is English Wikipedia-like", "passed the
    heuristic gates"). Returns (weights, consts), both lazy DataFrames:

    - weights: (bucket:long, weight:double) — one row per SEEN bucket,
      ≤ n_buckets rows by construction (the broadcastable model);
    - consts: ONE row (bias:double, w_default:double) — the class-prior
      log-odds and the weight of a never-seen bucket.

    Plan: one explode + map-side-combining groupBy(bucket) for the counts
    (V-row result), one tiny agg for totals, one row-count agg for the
    prior. No iteration, no driver-side state beyond Spark's own agg."""
    ev = df.select(
        F.col(label_col).cast("boolean").alias("pos"),
        F.explode(hashed_token_buckets(F.col(text_col), n_buckets)).alias("b"),
    )
    cnt = ev.groupBy("b").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("cp"),
        F.sum(F.when(~F.col("pos"), 1).otherwise(0)).alias("cn"),
    )
    tot = cnt.agg(F.sum("cp").alias("tp"), F.sum("cn").alias("tn"))
    v = F.lit(float(n_buckets))
    a = F.lit(float(alpha))
    weights = cnt.crossJoin(F.broadcast(tot)).select(
        F.col("b").alias("bucket"),
        (
            F.log((F.col("cp") + a) / (F.col("tp") + a * v))
            - F.log((F.col("cn") + a) / (F.col("tn") + a * v))
        ).alias("weight"),
    )
    prior = df.agg(
        F.sum(F.when(F.col(label_col).cast("boolean"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(~F.col(label_col).cast("boolean"), 1).otherwise(0)).alias("nn"),
    )
    consts = prior.crossJoin(F.broadcast(tot)).select(
        F.log(F.col("np").cast("double") / F.col("nn")).alias("bias"),
        (
            F.log(a / (F.col("tp") + a * v)) - F.log(a / (F.col("tn") + a * v))
        ).alias("w_default"),
    )
    return weights, consts


def score_quality_model(
    df: DataFrame,
    weights: DataFrame,
    consts: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 1 << 18,
) -> DataFrame:
    """(id, score): score = bias + Σ_tokens weight[bucket(token)], with
    never-seen buckets contributing w_default. P(high-quality | doc) =
    sigmoid(score); filter on score > τ (τ=0 ⇔ posterior 0.5).

    Scale shape: explode keeps a doc's token rows in their input partition,
    the weights join is an explicit broadcast (model ≤ n_buckets rows), and
    the groupBy(id) sum exchanges one pre-combined row per doc."""
    ev = df.select(
        F.col(id_col).alias("id"),
        F.explode(hashed_token_buckets(F.col(text_col), n_buckets)).alias("b"),
    )
    joined = ev.join(
        F.broadcast(weights), ev["b"] == weights["bucket"], "left"
    ).crossJoin(F.broadcast(consts))
    return (
        joined.select(
            "id", "bias", F.coalesce(F.col("weight"), F.col("w_default")).alias("w")
        )
        .groupBy("id")
        .agg((F.first("bias") + F.sum("w")).alias("score"))
    )


def binary_auc_bucketed(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    *,
    lo: float = -64.0,
    hi: float = 64.0,
    n_buckets: int = 1024,
) -> DataFrame:
    """ROC-AUC of a score against boolean labels, via a fixed-grid score
    histogram — ONE row out: (auc, n_pos, n_neg).

    Exact rank-based AUC needs a global sort (single-partition window at any
    scale); the scale path is the same fixed-grid trick as the KS drift check
    (`operators/drift.ks_statistic`): bucket scores on a FIXED grid, count
    (pos, neg) per bucket with one map-side-combining groupBy, then compute
    the Mann-Whitney sum over the ≤n_buckets-row histogram (the only ordered
    window runs on that bounded relation, never on data). Within-bucket ties
    get the standard 0.5 credit, so the result converges to exact AUC as the
    grid refines and is DETERMINISTIC: the default grid width
    (hi-lo)/n_buckets = 0.125 is a power of two, so bucket assignment is
    exact IEEE arithmetic — identical in Spark and DuckDB, no transcendental
    functions near bucket edges. Scores are clamped into [lo, hi).
    """
    width = (hi - lo) / n_buckets
    b = F.least(
        F.greatest(
            F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    )
    h = (
        scored.select(b.alias("b"), F.col(label_col).cast("boolean").alias("pos"))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("p"),
            F.sum(F.when(~F.col("pos"), 1).otherwise(0)).alias("n"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    terms = h.select(
        "p",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("cum_n_below"),
    )
    return terms.agg(
        F.round(
            F.sum(F.col("p") * (F.col("cum_n_below") + F.col("n") * F.lit(0.5)))
            / (F.sum("p") * F.sum("n")),
            6,
        ).alias("auc"),
        F.sum("p").alias("n_pos"),
        F.sum("n").alias("n_neg"),
    )


def threshold_pick_bucketed(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    *,
    lo: float = -64.0,
    hi: float = 64.0,
    n_buckets: int = 1024,
) -> DataFrame:
    """Operating-point selection for a classifier gate: sweep every
    bucket edge of the fixed score grid as a candidate threshold and
    return the Youden-J argmax — ONE row (threshold, tpr, fpr, youden_j,
    precision, recall, f1, n_pos, n_neg). Completes the model-eval loop
    after `binary_auc_bucketed` (ranking quality) with the answer a
    pipeline actually deploys: WHERE to cut.

    Same scale shape as the AUC: one map-side-combining histogram
    groupBy; TP/FP at every candidate edge are suffix sums over the
    ≤n_buckets-row relation (bounded window, never data). Ties on J
    break toward the LOWEST threshold (more recall), deterministically.
    The grid width is a power of two so thresholds are exact doubles."""
    from pyspark.sql import Window

    width = (hi - lo) / n_buckets
    b = F.least(
        F.greatest(
            F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    )
    h = (
        scored.select(b.alias("b"), F.col(label_col).cast("boolean").alias("pos"))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("p"),
            F.sum(F.when(~F.col("pos"), 1).otherwise(0)).alias("n"),
        )
    )
    wdesc = Window.orderBy(F.desc("b")).rowsBetween(Window.unboundedPreceding, 0)
    tot = h.agg(F.sum("p").alias("tot_p"), F.sum("n").alias("tot_n"))
    cand = (
        h.withColumn("tp", F.sum("p").over(wdesc))
        .withColumn("fp", F.sum("n").over(wdesc))
        .crossJoin(F.broadcast(tot))
    )
    tpr = F.col("tp").cast("double") / F.col("tot_p")
    fpr = F.col("fp").cast("double") / F.col("tot_n")
    j = tpr - fpr
    prec = F.when(
        (F.col("tp") + F.col("fp")) > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
    )
    f1 = F.when(
        (prec + tpr) > 0, F.lit(2.0) * prec * tpr / (prec + tpr)
    )
    snap = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)  # noqa: E731
    staged = cand.select(
        (F.lit(lo) + F.col("b").cast("double") * F.lit(width)).alias("threshold"),
        snap(tpr).alias("tpr"),
        snap(fpr).alias("fpr"),
        snap(j).alias("youden_j"),
        snap(prec).alias("precision"),
        snap(tpr).alias("recall"),
        snap(f1).alias("f1"),
        F.col("tot_p").alias("n_pos"),
        F.col("tot_n").alias("n_neg"),
    )
    ranked = staged.withColumn(
        "_rk",
        F.row_number().over(Window.orderBy(F.desc("youden_j"), F.asc("threshold"))),
    )
    return ranked.where(F.col("_rk") == 1).drop("_rk")


def calibration_deciles_bucketed(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    *,
    lo: float = -64.0,
    hi: float = 64.0,
    n_buckets: int = 1024,
) -> DataFrame:
    """Reliability diagram from the same fixed-grid histogram: split the
    score distribution into 10 equal-count deciles (cumulative-count
    blocking over the bounded histogram — the `equal_frequency_bins`
    trick, no data re-sort) and report each decile's observed positive
    rate beside its mean score: (decile, n, n_pos, mean_score, pos_rate).
    A well-calibrated gate shows pos_rate monotone in mean_score; the
    mean uses bucket midpoints (fixed power-of-two grid, engine-exact
    products)."""
    from pyspark.sql import Window

    width = (hi - lo) / n_buckets
    b = F.least(
        F.greatest(
            F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    )
    h = (
        scored.select(b.alias("b"), F.col(label_col).cast("boolean").alias("pos"))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("p"),
            F.sum(F.when(~F.col("pos"), 1).otherwise(0)).alias("n"),
        )
    )
    wasc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    tot = h.agg(F.sum(F.col("p") + F.col("n")).alias("T"))
    staged = (
        h.withColumn("cum", F.coalesce(F.sum(F.col("p") + F.col("n")).over(wasc), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "decile",
            F.least(F.expr("(cum * 10) DIV T").cast("int"), F.lit(9)),
        )
    )
    mid = F.lit(lo) + (F.col("b").cast("double") + F.lit(0.5)) * F.lit(width)
    snap = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)  # noqa: E731
    agg = staged.groupBy("decile").agg(
        F.sum(F.col("p") + F.col("n")).alias("n"),
        F.sum("p").alias("n_pos"),
        F.sum(mid * (F.col("p") + F.col("n")).cast("double")).alias("_ms"),
    )
    return agg.select(
        "decile",
        "n",
        "n_pos",
        snap(F.col("_ms") / F.col("n")).alias("mean_score"),
        snap(F.col("n_pos").cast("double") / F.col("n")).alias("pos_rate"),
    )
