"""duplicate_clusters: connected components over candidate-pair edges.

Reference analogue: none (training-data pipeline extension) — turns the
pairwise near-dup evidence (LSH / SimHash / Jaccard pairs) into dedup
groups, the missing last step of the dedup family.
"""

import pytest


def _clusters(spark, edges, **kw):
    from jsonschema_spark.operators.dedup import duplicate_clusters

    df = spark.createDataFrame(edges, "id_a: bigint, id_b: bigint")
    out = duplicate_clusters(df, **kw)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_two_components_min_label(spark):
    got = _clusters(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_chain_needs_multiple_rounds(spark):
    # path graph 1-2-3-...-8: min label must walk the full diameter
    got = _clusters(spark, [(i, i + 1) for i in range(1, 8)])
    assert set(got.values()) == {1} and len(got) == 8


def test_nodes_only_from_edges(spark):
    got = _clusters(spark, [(5, 9)])
    assert got == {5: 5, 9: 5}


def test_nonconvergence_fails_closed(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _clusters(spark, [(i, i + 1) for i in range(1, 9)], max_iters=1)


def test_lsh_to_clusters_end_to_end(spark):
    """Full pipeline on real docs: every pair-connected doc lands in one
    cluster whose id is the min doc_id of its component."""
    from jsonschema_spark.queries import dup_clusters_docs

    rows = dup_clusters_docs(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected non-empty clusters at sf0.001"
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)
        assert len(members) >= 2  # every edge endpoint has a partner


def test_dedup_corpus_exact_and_near(spark):
    """Exact copies collapse to min id; near-dups (one-token edits of the
    same text) collapse to the cluster rep; distinct texts survive."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.dedup import dedup_corpus

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    rows = [
        (1, base), (2, "THE  quick brown fox jumps over the lazy dog again and again today"),
        (3, near),
        (4, "an entirely different document about spark physical plans and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    kept = sorted(r["doc_id"] for r in dedup_corpus(df, "doc_id", "text").collect())
    assert 2 not in kept          # exact dup of 1 (case/whitespace)
    assert 1 in kept and 4 in kept
    assert kept == [1, 4]         # 3 is a near-dup of 1 → dropped


def test_dedup_corpus_keeps_everything_when_distinct(spark):
    from jsonschema_spark.operators.dedup import dedup_corpus

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(10))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    assert dedup_corpus(df, "doc_id", "text").count() == 20


def test_star_matches_propagation_on_components(spark):
    edges = [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21)]
    got = _clusters(spark, edges, algorithm="star")
    assert got == _clusters(spark, edges, algorithm="propagation")
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_star_handles_long_chain_in_log_rounds(spark):
    """A 64-node path defeats 12 rounds of propagation but star contraction
    needs only O(log n): must converge inside the same default max_iters."""
    got = _clusters(spark, [(i, i + 1) for i in range(1, 64)], algorithm="star")
    assert set(got.values()) == {1} and len(got) == 63 + 1


def test_unknown_algorithm_rejected(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown algorithm"):
        _clusters(spark, [(1, 2)], algorithm="nope")


def test_containment_catches_subset_docs_jaccard_misses(spark):
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta eta theta"  # strict subset
    extra = " ".join(f"word{i}" for i in range(40))  # 40 distinct filler words
    long = short + " " + extra
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, long), (2, short), (3, other)], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in containment_pairs(df, cand, "doc_id", "text", min_containment=0.9).collect()
    }
    # the short doc is fully contained in the long one: containment_b == 1.0
    assert out[(1, 2)][1] == 1.0
    # ...while its Jaccard against the long doc is well under any dedup bar
    jac = ngram_jaccard_pairs(df, "doc_id", "text", min_jaccard=0.0).filter(
        (F.col("id_a") == 1) & (F.col("id_b") == 2)
    ).collect()
    assert not jac or jac[0]["jaccard"] < 0.5
    # the unrelated pair is filtered out entirely
    assert (1, 3) not in out


class TestSelectRepresentatives:
    def _clusters(self, spark):
        # two clusters {1,2,3} and {10,11}, one singleton {20}
        return spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
            "id long, cluster_id long",
        )

    def test_argmax_score_with_id_tiebreak(self, spark):
        from jsonschema_spark.operators.dedup import select_representatives

        scores = spark.createDataFrame(
            # cluster 1: 2 wins on score; cluster 10: tie -> lowest id 10
            [(1, 5.0), (2, 9.0), (3, 7.0), (10, 4.0), (11, 4.0), (20, 1.0)],
            "id long, score double",
        )
        out = {r["cluster_id"]: (r["rep_id"], r["size"])
               for r in select_representatives(self._clusters(spark), scores).collect()}
        assert out == {1: (2, 3), 10: (10, 2), 20: (20, 1)}

    def test_plan_no_python_no_cartesian(self, spark):
        from pyspark.sql import functions as F

        from jsonschema_spark.operators.dedup import select_representatives

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        clusters = docs.select(F.col("doc_id").alias("id"), (F.col("doc_id") % 10).alias("cluster_id"))
        scores = docs.select(F.col("doc_id").alias("id"), F.length("text").alias("score"))
        p = select_representatives(clusters, scores)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "CartesianProduct" not in p
        # text payloads never enter an exchange: only id/cluster/score move
        for seg in p.split("Exchange")[1:]:
            assert "text#" not in seg.splitlines()[0]
