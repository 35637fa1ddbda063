"""BM25 scoring and RRF fusion: semantics and plan shape."""

from __future__ import annotations

import math

import pytest

from jsonschema_spark.operators.search import bm25_topk, rrf_fuse


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _bm25_ref(corpus, terms, k1=1.2, b=0.75):
    toks = [t.lower().split() for t in corpus]
    n = len(toks)
    avgdl = sum(len(d) for d in toks) / n
    scores = {}
    for i, d in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = d.count(t)
            df = sum(1 for dd in toks if t in dd)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if s > 0:
            scores[i] = s
    return scores


def test_bm25_matches_reference_formula(spark):
    corpus = [
        "spark join window group",
        "spark spark spark filter",
        "customer order line item",
        "window window join spark customer",
    ]
    terms = ["spark", "window"]
    out = {r["id"]: r["score"] for r in bm25_topk(_docs(spark, corpus), terms).collect()}
    ref = _bm25_ref(corpus, terms)
    assert set(out) == set(ref)
    for i, s in ref.items():
        assert out[i] == pytest.approx(s, abs=2e-6)


def test_bm25_rank_order_and_zero_filter(spark):
    corpus = ["a b c", "spark spark", "spark b", "x y z"]
    rows = bm25_topk(_docs(spark, corpus), ["spark"], top_k=10).collect()
    assert [r["id"] for r in rows] == [1, 2]  # tf=2 doc outranks tf=1
    assert [r["rank"] for r in rows] == [1, 2]
    # docs 0 and 3 (no match) never appear
    assert {r["id"] for r in rows} == {1, 2}


def test_bm25_rejects_bad_queries(spark):
    df = _docs(spark, ["a"])
    with pytest.raises(ValueError):
        bm25_topk(df, [])
    with pytest.raises(ValueError):
        bm25_topk(df, ["a", "a"])


def test_rrf_union_semantics(spark):
    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id bigint, rank bigint")
    r2 = spark.createDataFrame([(3, 1), (4, 2)], "id bigint, rank bigint")
    out = {r["id"]: (r["rrf_score"], r["rank"]) for r in rrf_fuse([r1, r2], k=60).collect()}
    assert set(out) == {1, 2, 3, 4}
    # id 3: in both lists -> 1/63 + 1/61; tops the fused ranking
    assert out[3][1] == 1
    assert out[3][0] == pytest.approx(1 / 63 + 1 / 61, abs=2e-6)
    assert out[1][0] == pytest.approx(1 / 61, abs=2e-6)


def test_rrf_needs_two_lists(spark):
    r1 = spark.createDataFrame([(1, 1)], "id bigint, rank bigint")
    with pytest.raises(ValueError):
        rrf_fuse([r1])


def test_bm25_plan_shape(spark):
    """No token explode, no Python, corpus stats broadcast, top-k is
    TakeOrdered (never a global Sort)."""
    corpus = ["spark join window"] * 8
    plan = (
        bm25_topk(_docs(spark, corpus), ["spark", "join"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan, plan
    assert "Generate" not in plan, plan  # explode-free tf computation
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
