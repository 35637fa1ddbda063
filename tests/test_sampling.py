"""Deterministic hash-based sampling/splitting (training-data pipeline ops).

The load-bearing property is determinism under recomposition: a document's
split/sample membership depends only on its key, never on the corpus around
it, the partitioning, or an RNG seed — verified explicitly below.
"""

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )


def test_hash_split_exhaustive_disjoint(spark):
    from jsonschema_spark.operators.sampling import hash_split

    out = hash_split(_docs(spark), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["cnt"] for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == 400  # every row assigned exactly once
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_hash_split_stable_under_corpus_growth(spark):
    """A doc's split must not change when the corpus around it changes."""
    from jsonschema_spark.operators.sampling import hash_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = {r["doc_id"]: r["split"] for r in hash_split(_docs(spark, 100), "doc_id", fr).collect()}
    big = {r["doc_id"]: r["split"] for r in hash_split(_docs(spark, 400), "doc_id", fr).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_hash_split_rejects_bad_fractions(spark):
    from jsonschema_spark.operators.sampling import hash_split

    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(_docs(spark), "doc_id", {"a": 0.5, "b": 0.2})


def test_stratified_rates_respected(spark):
    from jsonschema_spark.operators.sampling import stratified_sample

    out = stratified_sample(_docs(spark, 2000), "doc_id", "lang", {"0": 0.5, "1": 0.1})
    counts = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"0", "1"}  # unlisted strata dropped
    assert 0.35 < counts["0"] / 500 < 0.65
    assert 0.02 < counts["1"] / 500 < 0.25


def test_deterministic_sample_n_exact_and_stable(spark):
    from jsonschema_spark.operators.sampling import deterministic_sample_n

    a = sorted(r["doc_id"] for r in deterministic_sample_n(_docs(spark), "doc_id", 37).collect())
    b = sorted(r["doc_id"] for r in deterministic_sample_n(_docs(spark), "doc_id", 37).collect())
    assert len(a) == 37 and a == b
    # smaller n is a prefix of larger n (same hash order)
    c = sorted(r["doc_id"] for r in deterministic_sample_n(_docs(spark), "doc_id", 10).collect())
    assert set(c) <= set(a)


def test_split_and_sample_stay_shuffle_free(spark):
    from jsonschema_spark.operators.sampling import hash_split, stratified_sample

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p1 = plan(hash_split(_docs(spark), "doc_id", {"train": 0.9, "test": 0.1}))
    p2 = plan(stratified_sample(_docs(spark), "doc_id", "lang", 0.25))
    for p in (p1, p2):
        assert "Exchange" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_deterministic_sample_n_is_take_ordered(spark):
    """limit-n over hash order must compile to TakeOrdered (per-partition
    top-n + merge), NOT a global sort."""
    from jsonschema_spark.operators.sampling import deterministic_sample_n

    p = deterministic_sample_n(_docs(spark), "doc_id", 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in p, p[:400]


def test_split_properties(spark):
    """Property check: any fraction dict summing to 1 yields an exhaustive,
    deterministic, corpus-independent assignment."""
    from hypothesis import given, settings, strategies as st

    from jsonschema_spark.operators.sampling import hash_split

    @settings(max_examples=8, deadline=None)
    @given(weights=st.lists(st.integers(min_value=1, max_value=10), min_size=1, max_size=5))
    def check(weights):
        total = sum(weights)
        fr = {f"s{i}": w / total for i, w in enumerate(weights)}
        # renormalize the float sum exactly to 1
        fr[f"s{len(weights) - 1}"] = 1.0 - sum(
            v for k, v in fr.items() if k != f"s{len(weights) - 1}"
        )
        df = _docs(spark, 150)
        out = hash_split(df, "doc_id", fr).collect()
        assert len(out) == 150
        assert {r["split"] for r in out} <= set(fr)
        again = hash_split(df, "doc_id", fr).collect()
        assert sorted((r["doc_id"], r["split"]) for r in out) == sorted(
            (r["doc_id"], r["split"]) for r in again
        )

    check()


# ----- quantile bucketing (CCNet head/middle/tail) --------------------------


def _scored(spark, n=90):
    # values 0..n-1 within 3 langs, interleaved so every lang spans the range
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        F.col("id").cast("double").alias("ppl"),
    )


def test_quantile_buckets_equal_counts_per_group(spark):
    from jsonschema_spark.operators.sampling import quantile_buckets

    out = quantile_buckets(
        _scored(spark), "ppl", "lang", n_buckets=3,
        labels=["head", "middle", "tail"], id_col="doc_id",
    )
    counts = {
        (r["lang"], r["bucket"]): r["cnt"]
        for r in out.groupBy("lang", "bucket").agg(F.count("*").alias("cnt")).collect()
    }
    assert all(v == 10 for v in counts.values()) and len(counts) == 9


def test_quantile_buckets_orders_by_value(spark):
    from jsonschema_spark.operators.sampling import quantile_buckets

    out = quantile_buckets(
        _scored(spark), "ppl", "lang", n_buckets=3,
        labels=["head", "middle", "tail"], id_col="doc_id",
    ).filter(F.col("lang") == "0")
    rows = {r["doc_id"]: r["bucket"] for r in out.collect()}
    # lang 0 holds ids 0,3,...,87; lowest third (0..27) must be head, top third tail
    assert rows[0] == "head" and rows[27] == "head"
    assert rows[30] == "middle" and rows[57] == "middle"
    assert rows[60] == "tail" and rows[87] == "tail"


def test_quantile_buckets_label_count_mismatch(spark):
    from jsonschema_spark.operators.sampling import quantile_buckets

    with pytest.raises(ValueError):
        quantile_buckets(_scored(spark), "ppl", "lang", n_buckets=3, labels=["a", "b"])


def test_bucket_by_thresholds_agrees_on_separated_values(spark):
    """The sketch-threshold scale path must agree with exact ntile when
    values are distinct (no ties, accuracy ample for the group size)."""
    from jsonschema_spark.operators.sampling import bucket_by_thresholds, quantile_buckets

    d = _scored(spark)
    exact = {
        r["doc_id"]: r["bucket"]
        for r in quantile_buckets(
            d, "ppl", "lang", n_buckets=3, labels=["head", "middle", "tail"], id_col="doc_id"
        ).collect()
    }
    approx = {
        r["doc_id"]: r["bucket"]
        for r in bucket_by_thresholds(
            d, "ppl", "lang", n_buckets=3, labels=["head", "middle", "tail"]
        ).collect()
    }
    agree = sum(exact[k] == approx[k] for k in exact)
    assert agree >= 0.9 * len(exact)  # boundary rows may differ by one bucket


def test_bucket_by_thresholds_no_sort_exchange(spark):
    """Plan gate: the scale path must broadcast the cut points — no
    per-group Sort over the corpus, no window."""
    from jsonschema_spark.operators.sampling import bucket_by_thresholds

    out = bucket_by_thresholds(_scored(spark), "ppl", "lang", n_buckets=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


class TestMixtureSample:
    def _docs(self, spark):
        rows = [(i, "a" if i % 4 != 3 else "b") for i in range(400)]
        rows += [(1000 + i, "rare") for i in range(5)]
        return spark.createDataFrame(rows, "doc_id long, grp string")

    def test_proportions_and_caps(self, spark):
        from jsonschema_spark.operators.sampling import mixture_sample

        df = self._docs(spark)
        # targets 50/25/25, out_frac 0.5 over 405 docs -> quotas ~101/51/51;
        # 'rare' has only 5 docs -> capped at frac 1.0, keeps all 5
        out = mixture_sample(df, "doc_id", "grp", {"a": 0.5, "b": 0.25, "rare": 0.25}, 0.5)
        got = {g: 0 for g in ("a", "b", "rare")}
        for r in out.collect():
            got[r["grp"]] += 1
        assert got["rare"] == 5
        assert 80 <= got["a"] <= 125  # ~101 expected, hash variance
        assert 35 <= got["b"] <= 70  # ~51 expected

    def test_untargeted_groups_dropped_and_deterministic(self, spark):
        from jsonschema_spark.operators.sampling import mixture_sample

        df = self._docs(spark)
        out1 = sorted(r["id"] for r in mixture_sample(df, "doc_id", "grp", {"a": 1.0}, 0.25).collect())
        out2 = sorted(r["id"] for r in mixture_sample(df, "doc_id", "grp", {"a": 1.0}, 0.25).collect())
        assert out1 == out2
        kept_groups = {r["grp"] for r in mixture_sample(df, "doc_id", "grp", {"a": 1.0}, 0.25).collect()}
        assert kept_groups == {"a"}

    def test_membership_stable_under_other_group_growth(self, spark):
        from jsonschema_spark.operators.sampling import mixture_sample

        df = self._docs(spark)
        grown = df.unionByName(
            spark.createDataFrame([(5000 + i, "b") for i in range(200)], "doc_id long, grp string")
        )
        kept_a_before = {r["id"] for r in mixture_sample(df, "doc_id", "grp", {"a": 0.5, "b": 0.5}, 0.25).collect() if r["grp"] == "a"}
        kept_a_after = {r["id"] for r in mixture_sample(grown, "doc_id", "grp", {"a": 0.5, "b": 0.5}, 0.25).collect() if r["grp"] == "a"}
        # group a's count and target are unchanged; N_total grew, so a's
        # quota can only grow — the before-set must survive intact
        assert kept_a_before <= kept_a_after

    def test_plan_broadcasts_group_plan_no_python(self, spark):
        from jsonschema_spark.operators.sampling import mixture_sample

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = mixture_sample(docs, "doc_id", "lang", {"en": 0.5, "de": 0.5}, 0.5)
        p = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "BroadcastHashJoin" in p
        for seg in p.split("Exchange")[1:]:
            assert "text#" not in seg.splitlines()[0]


class TestShardOrder:
    def test_positions_dense_and_deterministic(self, spark):
        from jsonschema_spark.operators.sampling import shard_order

        df = _docs(spark, 300)
        out = shard_order(df, "doc_id", n_shards=4)
        rows = out.collect()
        assert len(rows) == 300
        by_shard = {}
        for r in rows:
            assert 0 <= r["shard"] < 4
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        # positions within each shard are a dense 1..n_s permutation
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1))
        # fully deterministic across runs
        again = {(r["doc_id"]): (r["shard"], r["pos"]) for r in shard_order(df, "doc_id", n_shards=4).collect()}
        first = {(r["doc_id"]): (r["shard"], r["pos"]) for r in rows}
        assert first == again

    def test_order_independent_of_input_partitioning(self, spark):
        from jsonschema_spark.operators.sampling import shard_order

        df = _docs(spark, 300)
        a = {r["doc_id"]: (r["shard"], r["pos"]) for r in shard_order(df, "doc_id", n_shards=4).collect()}
        b = {r["doc_id"]: (r["shard"], r["pos"]) for r in shard_order(df.repartition(13), "doc_id", n_shards=4).collect()}
        assert a == b

    def test_no_python_one_exchange_on_shard(self, spark):
        from jsonschema_spark.operators.sampling import shard_order

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = shard_order(docs.select("doc_id"), "doc_id", n_shards=8)
        p = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert p.count("Exchange") == 1  # the shard hash partitioning only


class TestLeakageSafeSplit:
    def _clustered(self, spark):
        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in range(1, 101)], "doc_id long, text string"
        )
        # clusters: {1..5} -> 1, {50,51} -> 50; everything else singleton
        clusters = spark.createDataFrame(
            [(i, 1) for i in range(1, 6)] + [(50, 50), (51, 50)],
            "id long, cluster_id long",
        )
        return docs, clusters

    def test_cluster_members_share_a_split(self, spark):
        from jsonschema_spark.operators.sampling import leakage_safe_split

        docs, clusters = self._clustered(spark)
        out = leakage_safe_split(
            docs, clusters, {"train": 0.6, "val": 0.2, "test": 0.2}
        )
        rows = {r["doc_id"]: (r["split_key"], r["split"]) for r in out.collect()}
        assert len(rows) == 100
        assert len({rows[i] for i in range(1, 6)}) == 1  # one (key, split)
        assert rows[50] == rows[51]

    def test_singletons_match_plain_hash_split(self, spark):
        from jsonschema_spark.operators.sampling import hash_split, leakage_safe_split

        docs, clusters = self._clustered(spark)
        fr = {"train": 0.6, "val": 0.2, "test": 0.2}
        out = {r["doc_id"]: r["split"] for r in
               leakage_safe_split(docs, clusters, fr).collect()}
        plain = {r["doc_id"]: r["split"] for r in
                 hash_split(docs, "doc_id", fr).collect()}
        grouped = set(range(1, 6)) | {50, 51}
        for i in set(out) - grouped:
            assert out[i] == plain[i]
        # non-min members follow their cluster key, not their own hash
        assert all(out[i] == out[1] for i in range(2, 6))


class TestRobustOutliers:
    def test_injected_tail_is_flagged_and_median_immune(self, spark):
        from jsonschema_spark.operators.stats import robust_outliers

        # 97 inliers in [100, 102], 3 wild outliers — mean/stddev would be
        # dragged; median/MAD must hold and flag exactly the 3
        vals = [100.0 + (i % 3) for i in range(97)] + [1e6, -1e6, 5e5]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        row = robust_outliers(df, ["x"], k=3.5).collect()[0]
        assert row["column"] == "x" and row["n_present"] == 100
        assert 100.0 <= row["med"] <= 102.0
        assert row["n_outliers"] == 3

    def test_nulls_excluded_and_zero_mad_degenerate(self, spark):
        from jsonschema_spark.operators.stats import robust_outliers

        df = spark.createDataFrame(
            [(1.0,), (1.0,), (1.0,), (None,), (9.0,)], "x double"
        )
        row = robust_outliers(df, ["x"], k=3.5).collect()[0]
        assert row["n_present"] == 4
        # med=1, mad=0: any deviation at all is an outlier (strict >)
        assert row["mad"] == 0.0 and row["n_outliers"] == 1
