"""Bloom-prefiltered incremental dedup (operators/bloom.py): never a false
negative, false positives surfaced in the report, output identical to the
plain exact anti-join, and a JVM-only broadcast plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.bloom import (
    bloom_dedup_against,
    bloom_positions,
    bloom_probe,
    bloom_words,
)
from jsonschema_spark.operators.dedup import normalize_text


def _corpora(spark, n_ref=60, n_new=80, n_dup=15):
    ref = spark.createDataFrame(
        [(i, f"reference document number {i} with unique content") for i in range(n_ref)],
        "doc_id long, text string",
    )
    rows = [(1000 + i, f"fresh crawl page {i} never seen before") for i in range(n_new)]
    rows += [(2000 + i, f"reference document number {i} with unique content") for i in range(n_dup)]
    new = spark.createDataFrame(rows, "doc_id long, text string")
    return ref, new


def test_no_false_negatives_any_size(spark):
    # even an absurdly small filter must pass every TRUE duplicate
    ref, new = _corpora(spark)
    rep = bloom_dedup_against(new, ref, "doc_id", "text", n_bits=64, k=2, report=True)
    dup_rows = rep.filter(F.col("status") == "exact_dup").collect()
    assert len(dup_rows) == 15
    assert all(r["bloom_pass"] for r in dup_rows)
    assert all(r["match_id"] == r["id"] - 2000 for r in dup_rows)


def test_false_positives_observable_and_harmless(spark):
    ref, new = _corpora(spark)
    rep = bloom_dedup_against(new, ref, "doc_id", "text", n_bits=64, k=1, report=True).collect()
    fp = [r for r in rep if r["bloom_pass"] and r["status"] == "kept"]
    assert fp, "a 64-bit filter over 60 keys must show false positives"
    # false positives never change the verdict — status matches the anti-join
    assert all(r["match_id"] is None for r in fp)


def test_output_equals_plain_anti_join(spark):
    ref, new = _corpora(spark)
    surv = bloom_dedup_against(new, ref, "doc_id", "text", n_bits=256, k=2)
    norm = F.md5(normalize_text(F.col("text")))
    expected = new.join(
        ref.select(norm.alias("h")).distinct(),
        F.md5(normalize_text(new["text"])) == F.col("h"),
        "left_anti",
    )
    assert sorted(r["doc_id"] for r in surv.collect()) == sorted(
        r["doc_id"] for r in expected.collect()
    )


def test_positions_deterministic_and_in_range(spark):
    df = spark.createDataFrame([(f"key {i}",) for i in range(50)], "k string")
    rows = df.select(bloom_positions(F.col("k"), 1024, 4).alias("p")).collect()
    again = df.select(bloom_positions(F.col("k"), 1024, 4).alias("p")).collect()
    assert [r["p"] for r in rows] == [r["p"] for r in again]
    for r in rows:
        assert len(r["p"]) == 4
        assert all(0 <= x < 1024 for x in r["p"])


def test_power_of_two_enforced():
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), 1000, 3)
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), 1024, 0)


def test_words_bounded_by_bitset_size(spark):
    ref = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], "doc_id long, text string"
    )
    words = bloom_words(ref, normalize_text(F.col("text")), n_bits=256, k=3)
    rows = words.collect()
    assert len(rows) <= 256 // 32
    assert all(0 <= r["word"] < (1 << 32) for r in rows), "32-bit words stay sign-safe"


def test_probe_plan_broadcasts_words_no_python(spark):
    ref, new = _corpora(spark)
    key = normalize_text(F.col("text"))
    words = bloom_words(ref, key, n_bits=4096, k=3)
    out = bloom_probe(new, key, words, "doc_id", n_bits=4096, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan, "bloom probe must stay JVM-side"
    assert "CartesianProduct" not in plan
