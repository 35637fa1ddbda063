"""Hashed Naive-Bayes quality classifier (operators/quality_model.py):
separable classes score on the right side of 0, unseen tokens fall back to
w_default, the prior moves the bias, and the whole thing is deterministic."""

from __future__ import annotations

import math

import pytest

from jsonschema_spark.operators.quality_model import (
    fit_nb_quality_model,
    score_quality_model,
)

N_BUCKETS = 1 << 12


def _fit_and_score(spark, train_rows, score_rows):
    train = spark.createDataFrame(train_rows, "doc_id long, text string, pos boolean")
    weights, consts = fit_nb_quality_model(
        train, "doc_id", "text", "pos", n_buckets=N_BUCKETS
    )
    score = spark.createDataFrame(score_rows, "doc_id long, text string")
    out = score_quality_model(
        score, weights, consts, "doc_id", "text", n_buckets=N_BUCKETS
    )
    return {r["id"]: r["score"] for r in out.collect()}


def test_separable_classes_score_correct_side(spark):
    train = [(i, "clean good prose here", True) for i in range(10)]
    train += [(100 + i, "spam junk garbage noise", False) for i in range(10)]
    scores = _fit_and_score(
        spark,
        train,
        [(1000, "clean good prose"), (1001, "spam junk noise")],
    )
    assert scores[1000] > 0
    assert scores[1001] < 0


def test_unseen_tokens_use_default_weight(spark):
    train = [(0, "alpha beta", True), (1, "gamma delta", False)]
    scores = _fit_and_score(spark, train, [(10, "zzzz qqqq")])
    # balanced classes: bias = ln(1) = 0; two never-seen tokens, each
    # contributing w_default = ln(a/(tp+aV)) - ln(a/(tn+aV)) with tp=tn=2
    # -> 0. So the score is exactly 0.
    assert scores[10] == pytest.approx(0.0, abs=1e-12)


def test_prior_shifts_bias(spark):
    # 3:1 positive prior, all-unseen scoring text -> score == ln(3) exactly
    # (token weights cancel: tp == tn because both classes have 2 tokens...
    # they don't here, so only assert the sign and the all-unseen structure)
    train = [(i, "alpha beta", True) for i in range(3)] + [(9, "alpha beta", False)]
    scores = _fit_and_score(spark, train, [(10, "zzzz")])
    # tp = 6, tn = 2; w_default = ln(1/(6+V)) - ln(1/(2+V)) = ln((2+V)/(6+V))
    v = float(N_BUCKETS)
    expected = math.log(3.0) + math.log((2 + v) / (6 + v))
    assert scores[10] == pytest.approx(expected, rel=1e-12)


def test_deterministic(spark):
    train = [(i, f"word{i % 7} filler text", i % 3 == 0) for i in range(30)]
    a = _fit_and_score(spark, train, [(100, "word1 word2 filler")])
    b = _fit_and_score(spark, train, [(100, "word1 word2 filler")])
    assert a == b
