"""Distributed logistic-regression training by full-batch gradient
descent — the minimal "train a classifier ON the cluster" loop (quality
filters à la CCNet/fastText are trained exactly this way at corpus
scale; the repo's Naive-Bayes quality model is the one-pass closed-form
cousin, this is the iterative-optimizer shape).

Scale shape: one iteration = ONE map-side-combining aggregation over the
corpus computing the d+1 gradient sums Σ (σ(w·x) − y)·x_j — the model
(d+1 doubles) rides into the projection as literals, so there is no
weight broadcast join, no parameter server, no per-row Python; the
driver applies the step and re-issues. Iteration count is a fixed small
constant; each round's weights snap to the 1e-6 grid (nudge-then-floor)
so a SQL replica consuming the SAME snapped weights sees bit-identical
round inputs — cross-engine float drift cannot compound across rounds.

Features are standardized implicitly by the caller choosing bounded
transforms (log / ratios); no feature scan is needed before training.

Reference analogue: none (training-data pipeline extension, task spec).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["fit_logreg"]

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("feature", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)


def _snap(x: float) -> float:
    return math.floor(x * 1e6 + 1e-6) / 1e6


def fit_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    iterations: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """(feature, weight) after `iterations` full-batch gradient steps from
    w = 0 with learning rate `lr`; 'bias' is the intercept row. The label
    column must be boolean/0-1."""
    spark = df.sparkSession
    feats = ["bias"] + list(feature_cols)
    staged = df.select(
        F.lit(1.0).alias("bias"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    ).localCheckpoint(eager=True)

    w = [0.0] * len(feats)
    for _ in range(int(iterations)):
        z = sum((F.col(c) * F.lit(wi) for c, wi in zip(feats, w)), F.lit(0.0))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = p - F.col("__y")
        agg = staged.agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(resid * F.col(c)).alias(f"g_{c}") for c in feats],
        ).collect()[0]
        n = float(agg["__n"])
        w = [_snap(wi - lr * float(agg[f"g_{c}"]) / n) for c, wi in zip(feats, w)]
    return spark.createDataFrame(list(zip(feats, w)), _OUT_SCHEMA)
