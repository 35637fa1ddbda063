"""Benchmark decontamination (operators/decontamination.py)."""

from __future__ import annotations

import pytest

from jsonschema_spark.operators.decontamination import (
    contamination_scores,
    decontaminate,
    ngram_set,
)


@pytest.fixture()
def corpus(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], "id int, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # exact leak
            (2, "a quick brown fox jumps into the river today"),  # partial
            (3, "totally unrelated training text about spark plans"),
            (4, "too short"),
        ],
        "id int, text string",
    )
    return train, bench


def test_contamination_scores(spark, corpus):
    train, bench = corpus
    grams = ngram_set(bench, "text", n=4)
    rows = {r["id"]: r for r in contamination_scores(train, "id", "text", grams, n=4).collect()}
    assert rows[1]["contamination_frac"] == pytest.approx(1.0)
    # doc 2 shares exactly 'quick brown fox jumps' -> 1 of its 6 distinct 4-grams
    assert rows[2]["n_contaminated"] == 1
    assert rows[2]["contamination_frac"] == pytest.approx(1 / 6)
    assert rows[3]["contamination_frac"] == 0.0
    assert rows[4]["n_grams"] == 0 and rows[4]["contamination_frac"] == 0.0


def test_decontaminate_thresholds(spark, corpus):
    train, bench = corpus
    strict = decontaminate(train, "id", "text", bench, "text", n=4, max_frac=0.0)
    assert sorted(r["id"] for r in strict.collect()) == [3, 4]
    lenient = decontaminate(train, "id", "text", bench, "text", n=4, max_frac=0.5)
    assert sorted(r["id"] for r in lenient.collect()) == [2, 3, 4]
    # retained rows come back unchanged (schema + payload)
    assert strict.columns == train.columns


def test_contamination_broadcast_plan(spark, corpus):
    train, bench = corpus
    grams = ngram_set(bench, "text", n=4)
    plan = contamination_scores(
        train, "id", "text", grams, n=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the training side never shuffles text
    shuffled = contamination_scores(train, "id", "text", grams, n=4, broadcast=False)
    assert shuffled.count() == 4  # degraded mode still correct
