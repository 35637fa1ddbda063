"""Greedy max-coverage selection (operators/cover.greedy_cover) and the
sort-based 2-D skyline query: hand-checkable semantics + brute-force
cross-checks + plan gates (no self-join dominance, no Python)."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.cover import greedy_cover


def test_greedy_picks_max_marginal(spark):
    # doc 1 covers {a b c, b c d} (2 shingles); doc 2 covers 1 new shingle
    # beyond doc 1; doc 3 is a subset of doc 1 -> gain 0 once 1 is chosen
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # shingles: abc, bcd
            (2, "b c d e"),          # bcd, cde -> marginal 1 after doc 1
            (3, "a b c"),            # abc     -> marginal 0 after doc 1
        ],
        "doc_id long, text string",
    )
    out = [tuple(r) for r in greedy_cover(docs, "doc_id", "text", k=3).collect()]
    assert out[0] == (0, 1, 2, 2)
    assert out[1] == (1, 2, 1, 3)
    # third round: only doc 3 remains with zero marginal gain -> loop stops
    assert len(out) == 2


def test_greedy_tie_breaks_on_lowest_id(spark):
    docs = spark.createDataFrame(
        [(7, "x y z"), (4, "p q r")], "doc_id long, text string"
    )
    out = greedy_cover(docs, "doc_id", "text", k=1).collect()
    assert out[0]["doc_id"] == 4


def test_greedy_coverage_is_submodular_monotone(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = greedy_cover(docs, "doc_id", "text", k=3).collect()
    gains = [r["gain"] for r in rows]
    # greedy marginal gains are non-increasing (submodularity)
    assert gains == sorted(gains, reverse=True)
    assert rows[-1]["covered_total"] == sum(gains)


def test_skyline_matches_bruteforce(spark):
    from jsonschema_spark.queries import skyline_parts

    sky = {
        (r["p_partkey"], r["price_cents"], r["size"])
        for r in skyline_parts(spark, "/root/testdata/sf0.001").collect()
    }
    parts = (
        spark.read.parquet("/root/testdata/sf0.001/part.parquet")
        .select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("pc"),
            F.col("p_size").cast("int").alias("sz"),
        )
        .collect()
    )
    pts = [(r["p_partkey"], r["pc"], r["sz"]) for r in parts]
    brute = {
        (k, p, s)
        for (k, p, s) in pts
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for (_, p2, s2) in pts
        )
    }
    assert sky == brute


def test_skyline_plan_is_window_not_join(spark):
    from jsonschema_spark.queries import skyline_parts

    p = (
        skyline_parts(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p  # dominance must come from windows
    assert "Window" in p


class TestGroupQuantiles:
    def test_matches_spark_percentile_aggregate(self, spark):
        from jsonschema_spark.operators.stats import group_quantiles

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        ours = {
            (r["l_returnflag"], r["p"]): r["q"]
            for r in group_quantiles(li, "l_returnflag", "l_quantity").collect()
        }
        ref = li.groupBy("l_returnflag").agg(
            F.expr(
                "percentile(l_quantity, array(0.25D, 0.5D, 0.75D, 0.95D))"
            ).alias("qs")
        ).collect()
        for r in ref:
            for p, q in zip((0.25, 0.5, 0.75, 0.95), r["qs"]):
                snapped = __import__("math").floor(q * 1e6 + 1e-6) / 1e6
                assert abs(ours[(r["l_returnflag"], p)] - snapped) < 1e-9

    def test_single_scan_histogram_plan(self, spark):
        from jsonschema_spark.operators.stats import group_quantiles

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        p = (
            group_quantiles(li, "l_returnflag", "l_quantity")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert p.count("FileScan") == 1, "quantiles must come from ONE scan"
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestEqualFrequencyBins:
    def test_counts_conserved_and_edges_monotone(self, spark):
        from jsonschema_spark.operators.stats import equal_frequency_bins

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        rows = sorted(
            equal_frequency_bins(li, "l_quantity", n_bins=4).collect(),
            key=lambda r: r["bin"],
        )
        assert [r["bin"] for r in rows] == [0, 1, 2, 3]
        total = li.where(F.col("l_quantity").isNotNull()).count()
        assert sum(r["n"] for r in rows) == total
        for a, b in zip(rows, rows[1:]):
            assert a["hi"] == b["lo"]  # edges chain
            assert a["lo"] <= a["hi"]
        # equal-frequency: no bin grossly over/under target (ties distort)
        for r in rows:
            assert 0.1 * total < r["n"] < 0.45 * total

    def test_interior_edge_ties_go_low(self, spark):
        from jsonschema_spark.operators.stats import equal_frequency_bins

        df = spark.createDataFrame([(float(v),) for v in [1, 2, 2, 2, 3, 4]], "x double")
        rows = {r["bin"]: r for r in equal_frequency_bins(df, "x", n_bins=2).collect()}
        # median = 2.0; all three 2s land in bin 0 (v <= hi)
        assert rows[0]["n"] == 4 and rows[1]["n"] == 2
