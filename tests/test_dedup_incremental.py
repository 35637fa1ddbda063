"""dedup_against: incremental cross-corpus dedup (new batch vs existing
corpus). Reference analogue: none (training-data pipeline extension) — the
per-ingest step of a continuously-crawling pipeline: only NEW docs that
duplicate the REFERENCE corpus are dropped; duplicates *within* the new
batch are left alone (that's dedup_corpus's job, on whichever batch policy
the pipeline chooses)."""

import pytest


def _run(spark, new_rows, ref_rows, **kw):
    from jsonschema_spark.operators.dedup import dedup_against

    new = spark.createDataFrame(new_rows, "doc_id: bigint, text: string")
    ref = spark.createDataFrame(ref_rows, "doc_id: bigint, text: string")
    return dedup_against(new, ref, "doc_id", "text", **kw)


LONG_A = "the quick brown fox jumps over the lazy dog near the old river bank today"
LONG_B = "completely different content about spark shuffle partitions and join strategies"


def test_exact_cross_dup_dropped(spark):
    out = _run(
        spark,
        new_rows=[(10, LONG_A), (11, LONG_B)],
        ref_rows=[(1, LONG_A)],
    )
    assert {r["doc_id"] for r in out.collect()} == {11}


def test_exact_match_is_normalized(spark):
    # case + whitespace folding is part of the equivalence key
    out = _run(
        spark,
        new_rows=[(10, "  The   QUICK brown fox jumps over the lazy dog near the old river bank today ")],
        ref_rows=[(1, LONG_A)],
    )
    assert out.count() == 0


def test_near_cross_dup_dropped(spark):
    out = _run(
        spark,
        new_rows=[(10, LONG_A + " appended marker"), (11, LONG_B)],
        ref_rows=[(1, LONG_A)],
    )
    assert {r["doc_id"] for r in out.collect()} == {11}


def test_new_internal_dups_are_kept(spark):
    # two identical NEW docs with no reference counterpart both survive —
    # incremental dedup never self-joins the batch
    out = _run(
        spark,
        new_rows=[(10, LONG_A), (11, LONG_A)],
        ref_rows=[(1, LONG_B)],
    )
    assert {r["doc_id"] for r in out.collect()} == {10, 11}


def test_report_statuses_and_min_match_id(spark):
    rep = _run(
        spark,
        new_rows=[(10, LONG_A), (11, LONG_A + " appended marker"), (12, LONG_B)],
        ref_rows=[(2, LONG_A), (1, LONG_A), (5, LONG_B + " unrelated tail words here")],
        report=True,
    )
    got = {r["id"]: (r["status"], r["match_id"]) for r in rep.collect()}
    assert got[10] == ("exact_dup", 1)  # min of ref ids {1, 2} sharing the text
    assert got[11][0] == "near_dup" and got[11][1] in (1, 2)
    assert got[12][0] in ("kept", "near_dup")  # LONG_B vs LONG_B+tail: jaccard ~0.5 boundary
    if got[12][0] == "kept":
        assert got[12][1] is None


def test_report_covers_every_new_doc_exactly_once(spark):
    rep = _run(
        spark,
        new_rows=[(i, f"{LONG_A} variant {i}") for i in range(20)],
        ref_rows=[(1, LONG_A)],
        report=True,
    )
    ids = [r["id"] for r in rep.collect()]
    assert sorted(ids) == list(range(20))


def test_threshold_gates_near_pass(spark):
    # with an impossible threshold the near pass never fires; exact still does
    out = _run(
        spark,
        new_rows=[(10, LONG_A + " tail"), (11, LONG_A)],
        ref_rows=[(1, LONG_A)],
        jaccard_threshold=1.01,
        report=True,
    )
    got = {r["id"]: r["status"] for r in out.collect()}
    assert got == {10: "kept", 11: "exact_dup"}
