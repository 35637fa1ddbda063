"""ExactSubstr-style k-token-window dedup (operators/dedup.window_dup_stats):
unit semantics on hand-built docs + the plan-shape gate (hash-only exchange,
zero Python, no self-join / pair materialization)."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import window_dup_stats, window_hashes


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_window_dup_stats_semantics(spark):
    # a/b share an 8-token run ("one two ... eight"); c is unique; d too short
    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha beta gamma delta epsilon zeta eta theta"),
            (2, "prefix words here then " + shared + " and a different tail entirely"),
            (3, "totally unrelated content with enough tokens to form many windows here now"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in window_dup_stats(docs, "doc_id", "text", k=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 1: 16 tokens -> 9 windows, exactly 1 (the shared run) duplicated
    assert out[1]["n_windows"] == 9 and out[1]["n_dup"] == 1
    assert out[2]["n_dup"] == 1
    assert out[3]["n_dup"] == 0 and out[3]["keep"]
    assert out[4]["n_windows"] == 0 and out[4]["dup_frac"] == 0.0 and out[4]["keep"]
    # dup_frac is n_dup / n_windows
    assert abs(out[1]["dup_frac"] - 1 / 9) < 1e-9


def test_window_hashes_distinct_and_short_doc(spark):
    df = spark.createDataFrame(
        [("a b c a b c a b c",), ("x y",)], "text string"
    ).select(F.size(window_hashes(F.col("text"), 3)).alias("n"))
    ns = sorted(r["n"] for r in df.collect())
    # 9 tokens -> 7 windows but only 3 distinct cyclic patterns; short doc -> 0
    assert ns == [0, 3]


def test_window_dup_stats_plan_no_python_no_selfjoin(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(window_dup_stats(docs, "doc_id", "text", k=8))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # linear pipeline: window-hash count join + per-doc rollup + base re-join —
    # no CartesianProduct / no bucket self-join that could go quadratic
    assert "CartesianProduct" not in p
    # text payloads must not travel through the counting exchange: every
    # Exchange's output carries only ids/hashes/counts, never the text column
    for seg in p.split("Exchange")[1:]:
        first = seg.splitlines()[0]
        assert "text#" not in first, f"text payload shuffled: {first}"


class TestSubstringRemoval:
    def test_keeps_first_occurrence_removes_rest(self, spark):
        from jsonschema_spark.operators.dedup import substring_dedup

        shared = "one two three four five six seven eight"
        docs = spark.createDataFrame(
            [
                (1, shared + " alpha beta gamma delta epsilon zeta eta theta"),
                (2, "prefix words here then " + shared + " and a different tail entirely"),
                (3, "totally unrelated content with enough tokens to form many windows here"),
                (4, "too short"),
            ],
            "doc_id long, text string",
        )
        out = {r["id"]: r for r in substring_dedup(docs, "doc_id", "text", k=8).collect()}
        # doc 1 holds the canonical (first) occurrence: nothing removed
        assert out[1]["n_removed"] == 0
        assert out[1]["clean_text"].startswith(shared)
        # doc 2 loses exactly the 8 shared tokens, rest survives in order
        assert out[2]["n_removed"] == 8
        assert out[2]["clean_text"] == "prefix words here then and a different tail entirely"
        # unique and too-short docs pass through unchanged
        assert out[3]["n_removed"] == 0
        assert out[4]["n_removed"] == 0 and out[4]["clean_text"] == "too short"

    def test_within_doc_repeat_is_deduped(self, spark):
        from jsonschema_spark.operators.dedup import substring_dedup

        run = "a b c d e f g h"
        doc = run + " filler words between the runs yes " + run
        df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
        row = substring_dedup(df, "doc_id", "text", k=8).collect()[0]
        # the second occurrence of the 8-token run is removed
        assert row["n_removed"] == 8
        assert row["clean_text"] == run + " filler words between the runs yes"

    def test_plan_no_python_no_text_shuffle(self, spark):
        from jsonschema_spark.operators.dedup import substring_dedup

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = _plan(substring_dedup(docs, "doc_id", "text", k=8))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "CartesianProduct" not in p
        # the hash-counting exchange (partitioned by wh) must carry hashes
        # and positions only; the id-keyed flag re-attachment join is the
        # single place the token payload may travel
        for seg in p.split("Exchange")[1:]:
            first = seg.splitlines()[0]
            if "wh#" in first:
                assert "text#" not in first and "__toks#" not in first, (
                    f"payload shuffled through the hash exchange: {first}"
                )


class TestWinnowing:
    def test_guarantee_shared_run_leaves_common_fingerprint(self, spark):
        from jsonschema_spark.operators.dedup import winnow_fingerprints

        # k=3, w=3: guarantee holds for shared runs >= w+k-1 = 5 tokens
        shared = "alpha beta gamma delta epsilon"
        df = spark.createDataFrame(
            [
                (1, "one two " + shared + " nine ten eleven"),
                (2, shared + " completely different tail words here"),
            ],
            "doc_id long, text string",
        )
        fps = winnow_fingerprints(df, "doc_id", "text", k=3, w=3).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r["id"], set()).add(r["fp"])
        assert by_doc[1] & by_doc[2], "winnowing guarantee violated"

    def test_thinning_vs_all_grams(self, spark):
        from jsonschema_spark.operators.dedup import winnow_fingerprints

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        n_fps = winnow_fingerprints(docs, "doc_id", "text", k=5, w=4).count()
        # all k-gram count (non-winnowed baseline)
        from pyspark.sql import functions as F
        from jsonschema_spark.operators.dedup import tokens, word_ngrams

        staged = docs.select(tokens(F.col("text")).alias("__toks"))
        n_grams = (
            staged.select(F.explode(word_ngrams(F.col("__toks"), 5)).alias("g")).count()
        )
        assert n_fps < 0.6 * n_grams, f"winnowing should thin: {n_fps} vs {n_grams}"

    def test_short_docs_yield_nothing(self, spark):
        from jsonschema_spark.operators.dedup import winnow_dup_stats

        df = spark.createDataFrame(
            [(1, "a b c d e f g"), (2, "x")], "doc_id long, text string"
        )
        # 7 tokens, k=5 -> 3 grams, w=4 needs 4 -> no full window
        out = {r["id"]: r for r in winnow_dup_stats(df, "doc_id", "text", k=5, w=4).collect()}
        assert out[1]["n_fps"] == 0 and out[2]["n_fps"] == 0

    def test_plan_no_python_no_text_shuffle(self, spark):
        from jsonschema_spark.operators.dedup import winnow_dup_stats

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = winnow_dup_stats(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        for seg in p.split("Exchange")[1:]:
            assert "text#" not in seg.splitlines()[0]
