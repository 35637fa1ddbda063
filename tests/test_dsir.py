"""DSIR importance resampling (operators/dsir.py): target-like docs get
higher importance weights, selection is deterministic, the resample is
without-replacement top-k, and the scoring plan broadcasts the model with
zero Python."""

from __future__ import annotations

import pytest

from jsonschema_spark.operators.dsir import (
    dsir_sample,
    fit_importance_model,
    importance_weights,
)

N_BUCKETS = 1 << 12


def _weights(spark, target_rows, raw_rows):
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    w, c = fit_importance_model(target, raw, "text", n_buckets=N_BUCKETS)
    out = importance_weights(raw, w, c, "doc_id", "text", n_buckets=N_BUCKETS)
    return {r["id"]: r["logw"] for r in out.collect()}


def test_target_like_docs_outweigh_off_target(spark):
    target = [(i, "high quality encyclopedic prose article") for i in range(10)]
    raw = [(0, "high quality encyclopedic prose"), (1, "buy cheap pills now spam")]
    lw = _weights(spark, target, raw)
    assert lw[0] > lw[1]


def test_bigrams_distinguish_word_order(spark):
    # same unigram bag, different order: only the bigram features differ,
    # so the two raw docs must get different weights
    target = [(i, "alpha beta gamma") for i in range(5)]
    lw = _weights(spark, target, [(0, "alpha beta gamma"), (1, "gamma beta alpha")])
    assert lw[0] != lw[1]
    assert lw[0] > lw[1]


def test_sample_is_topk_without_replacement(spark):
    target = spark.createDataFrame(
        [(i, "wiki article text") for i in range(5)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, "wiki article text" if i % 2 == 0 else "junk spam noise") for i in range(40)],
        "doc_id long, text string",
    )
    out = dsir_sample(raw, target, "doc_id", "text", 10, n_buckets=N_BUCKETS)
    rows = out.collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == 10
    assert len(set(ids)) == 10
    # target-like docs dominate the selection: the Gumbel noise is O(1)
    # while the weight gap here is large
    assert sum(1 for i in ids if i % 2 == 0) >= 8


def test_deterministic_selection(spark):
    target = spark.createDataFrame(
        [(i, f"tok{i % 3} common words") for i in range(6)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, f"tok{i % 5} common words extra") for i in range(30)],
        "doc_id long, text string",
    )
    a = dsir_sample(raw, target, "doc_id", "text", 7, n_buckets=N_BUCKETS).collect()
    b = dsir_sample(raw, target, "doc_id", "text", 7, n_buckets=N_BUCKETS).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_empty_or_unseen_features_still_scored(spark):
    target = [(0, "alpha beta")]
    lw = _weights(spark, target, [(1, "alpha beta"), (2, "qqqq zzzz")])
    assert set(lw) == {1, 2}
    # doc 2's features were counted on the raw side of the fit, so they ARE
    # seen buckets (cr>0, ct=0) with a negative log-ratio
    assert lw[2] < 0


def test_scoring_plan_broadcasts_model_no_python(spark):
    target = spark.createDataFrame(
        [(i, "some text") for i in range(4)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, "some text more") for i in range(8)], "doc_id long, text string"
    )
    w, c = fit_importance_model(target, raw, "text", n_buckets=N_BUCKETS)
    out = importance_weights(raw, w, c, "doc_id", "text", n_buckets=N_BUCKETS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan, "scoring must stay JVM-side"
    assert "CartesianProduct" not in plan
