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


class TestBigramLM:
    def test_fit_bigram_pml(self, spark, model_corpus):
        from jsonschema_spark.operators.lm_quality import fit_bigram_lm

        _, bi = fit_bigram_lm(model_corpus, "text")
        pml = {(r["w1"], r["w2"]): r["pml"] for r in bi.collect()}
        # contexts: the->{cat:2, mat:1}, cat->{sat:1, the:1}
        assert pml[("the", "cat")] == pytest.approx(2 / 3)
        assert pml[("the", "mat")] == pytest.approx(1 / 3)
        assert pml[("cat", "sat")] == pytest.approx(0.5)   # 1/2
        assert pml[("cat", "the")] == pytest.approx(0.5)
        assert ("sat", "the") not in pml or pml[("sat", "the")] == pytest.approx(1.0)

    def test_truncation_keeps_full_context_counts(self, spark, model_corpus):
        from jsonschema_spark.operators.lm_quality import fit_bigram_lm

        # bigram_size=1 keeps only the most frequent bigram, but its pml is
        # still measured against the FULL context count
        _, bi = fit_bigram_lm(model_corpus, "text", bigram_size=1)
        rows = bi.collect()
        assert len(rows) == 1
        assert (rows[0]["w1"], rows[0]["w2"]) == ("the", "cat")
        assert rows[0]["pml"] == pytest.approx(2 / 3)

    def test_interpolated_scoring(self, spark, model_corpus):
        from jsonschema_spark.operators.lm_quality import (
            bigram_perplexity_scores,
            fit_bigram_lm,
        )

        uni, bi = fit_bigram_lm(model_corpus, "text")
        docs = spark.createDataFrame(
            [(10, "the cat"), (11, "cat the")], "id int, text string"
        )
        out = {r["id"]: r for r in bigram_perplexity_scores(docs, "id", "text", uni, bi).collect()}
        # doc 10: p = p_uni(the) = 4/12, then 0.75*pml(the,cat) + 0.25*p_uni(cat)
        p1 = 4 / 12
        p2 = 0.75 * (2 / 3) + 0.25 * (3 / 12)
        exp_ppl = math.exp(-(math.log(p1) + math.log(p2)) / 2)
        assert out[10]["perplexity"] == pytest.approx(round(exp_ppl, 6), abs=2e-6)
        assert out[10]["n_hits"] == 1 and out[10]["n_tokens"] == 2
        # word-order scramble: same unigrams, worse bigram fit ⇒ higher ppl
        assert out[11]["perplexity"] > out[10]["perplexity"]

    def test_score_plan_broadcast_no_python(self, spark, model_corpus):
        from jsonschema_spark.operators.lm_quality import (
            bigram_perplexity_scores,
            fit_bigram_lm,
        )

        uni, bi = fit_bigram_lm(model_corpus, "text")
        docs = spark.createDataFrame([(10, "the cat")], "id int, text string")
        plan = bigram_perplexity_scores(docs, "id", "text", uni, bi)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
