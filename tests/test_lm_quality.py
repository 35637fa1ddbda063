"""Unigram-LM perplexity scoring (operators/lm_quality.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.lm_quality import fit_unigram_lm, perplexity_scores


@pytest.fixture()
def model_corpus(spark):
    # token mass: the=3, cat=2, sat=1, mat=1  -> total=7
    return spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat the mat")], "id int, text string"
    )


def test_fit_unigram_lm_probabilities(spark, model_corpus):
    model = fit_unigram_lm(model_corpus, "text", vocab_size=4096)
    rows = {r["token"]: r["logp"] for r in model.collect()}
    # K=4 kept tokens, total=7 -> denominator 7+4+1=12, add-one numerators
    assert rows["the"] == pytest.approx(math.log(4 / 12))
    assert rows["cat"] == pytest.approx(math.log(3 / 12))
    assert rows["sat"] == pytest.approx(math.log(2 / 12))
    assert rows[None] == pytest.approx(math.log(1 / 12))  # OOV row


def test_fit_vocab_cut_is_deterministic(spark, model_corpus):
    # vocab_size=2 keeps the two most frequent; tie (sat/mat, cnt=1) is cut,
    # and the tie-break inside the keep set is (cnt desc, token asc)
    model = fit_unigram_lm(model_corpus, "text", vocab_size=2)
    kept = {r["token"] for r in model.collect() if r["token"] is not None}
    assert kept == {"the", "cat"}
    # K=2 -> denominator total+K+1 = 10
    rows = {r["token"]: r["logp"] for r in model.collect()}
    assert rows["the"] == pytest.approx(math.log(4 / 10))
    assert rows[None] == pytest.approx(math.log(1 / 10))


def test_perplexity_scores(spark, model_corpus):
    model = fit_unigram_lm(model_corpus, "text", vocab_size=4096)
    docs = spark.createDataFrame(
        [(10, "the cat"), (11, "zebra zebra")], "id int, text string"
    )
    out = {r["id"]: r for r in perplexity_scores(docs, "id", "text", model).collect()}
    h10 = -(math.log(4 / 12) + math.log(3 / 12)) / 2
    assert out[10]["perplexity"] == pytest.approx(round(math.exp(h10), 6))
    assert out[10]["n_oov"] == 0 and out[10]["n_tokens"] == 2
    # all-OOV doc: perplexity is exactly the inverse OOV prob (=12)
    assert out[11]["n_oov"] == 2
    assert out[11]["perplexity"] == pytest.approx(12.0)
    # in-distribution text scores strictly lower than OOV text
    assert out[10]["perplexity"] < out[11]["perplexity"]


def test_score_plan_is_broadcast_no_python(spark, model_corpus):
    model = fit_unigram_lm(model_corpus, "text", vocab_size=4096)
    docs = spark.createDataFrame([(10, "the cat")], "id int, text string")
    plan = perplexity_scores(docs, "id", "text", model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
