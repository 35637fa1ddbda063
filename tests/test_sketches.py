"""Count-min sketch: upper-bound property, exactness at low load,
mergeability, plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jsonschema_spark.operators.sketches import cms_build, cms_estimate, cms_merge


def _items(spark, terms):
    return spark.createDataFrame([(t,) for t in terms], "term string")


def test_estimate_is_exact_when_width_is_ample(spark):
    terms = ["a"] * 5 + ["b"] * 3 + ["c"]
    sk = cms_build(_items(spark, terms), "term", depth=4, width=4096)
    est = {
        r["term"]: r["cms_count"]
        for r in cms_estimate(sk, ["a", "b", "c", "zz"], depth=4, width=4096).collect()
    }
    # at 3 distinct terms vs 4096 columns collisions are (provably for
    # these md5 cells) absent — estimates are exact, absentee is 0
    assert est == {"a": 5, "b": 3, "c": 1, "zz": 0}


def test_estimate_never_undercounts_under_collision_pressure(spark):
    terms = [f"t{i}" for i in range(200) for _ in (0, 1)]  # 200 terms × 2
    sk = cms_build(_items(spark, terms), "term", depth=3, width=16)
    est = {
        r["term"]: r["cms_count"]
        for r in cms_estimate(
            sk, [f"t{i}" for i in range(10)], depth=3, width=16
        ).collect()
    }
    assert all(v >= 2 for v in est.values())  # CMS never undercounts


def test_merge_equals_build_of_concat(spark):
    a = ["x"] * 4 + ["y"]
    b = ["y"] * 2 + ["z"] * 3
    sk = cms_merge(
        cms_build(_items(spark, a), "term", depth=4, width=64),
        cms_build(_items(spark, b), "term", depth=4, width=64),
    )
    whole = cms_build(_items(spark, a + b), "term", depth=4, width=64)
    assert sorted(map(tuple, sk.collect())) == sorted(map(tuple, whole.collect()))


def test_validation_errors(spark):
    sk = cms_build(_items(spark, ["a"]), "term")
    with pytest.raises(ValueError):
        cms_estimate(sk, [])
    with pytest.raises(ValueError):
        cms_merge()


def test_build_plan_is_python_free_single_exchange(spark):
    sk = cms_build(_items(spark, ["a", "b"]), "term", depth=4, width=2048)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


class TestHLL:
    def test_estimate_accuracy(self, spark):
        from jsonschema_spark.operators.sketches import hll_build, hll_estimate

        df = spark.range(10_000).select(F.col("id").cast("string").alias("t"))
        est = hll_estimate(hll_build(df, "t")).collect()[0]
        # deterministic draw lands -2.6 sigma low (8337); 0.2 = ~3 sigma at m=256
        assert abs(est["estimate"] - 10_000) / 10_000 < 0.2

    def test_small_range_linear_counting(self, spark):
        from jsonschema_spark.operators.sketches import hll_build, hll_estimate

        df = spark.range(30).select(F.col("id").cast("string").alias("t"))
        est = hll_estimate(hll_build(df, "t")).collect()[0]
        assert abs(est["estimate"] - 30) < 5

    def test_merge_equals_union_build(self, spark):
        from jsonschema_spark.operators.sketches import hll_build, hll_merge

        a = spark.range(0, 5_000).select(F.col("id").cast("string").alias("t"))
        b = spark.range(3_000, 8_000).select(F.col("id").cast("string").alias("t"))
        merged = {
            (r["reg"], r["max_rho"])
            for r in hll_merge(hll_build(a, "t"), hll_build(b, "t")).collect()
        }
        direct = {
            (r["reg"], r["max_rho"])
            for r in hll_build(a.unionByName(b), "t").collect()
        }
        assert merged == direct

    def test_duplicates_do_not_move_registers(self, spark):
        from jsonschema_spark.operators.sketches import hll_build

        a = spark.range(100).select(F.col("id").cast("string").alias("t"))
        b = a.unionByName(a).unionByName(a)
        ra = {(r["reg"], r["max_rho"]) for r in hll_build(a, "t").collect()}
        rb = {(r["reg"], r["max_rho"]) for r in hll_build(b, "t").collect()}
        assert ra == rb

    def test_daily_sketches_merge_to_global(self, spark):
        from jsonschema_spark.operators.sketches import hll_build, hll_merge

        df = spark.createDataFrame(
            [(d, str(u)) for d in ("d1", "d2", "d3") for u in range(d.__hash__() % 7, 200)],
            "day string, t string",
        )
        per_day = hll_build(df, "t", group_cols=("day",))
        merged = {
            (r["reg"], r["max_rho"])
            for r in hll_merge(per_day.drop("day")).collect()
        }
        direct = {(r["reg"], r["max_rho"]) for r in hll_build(df, "t").collect()}
        assert merged == direct


class TestCMSJoinSize:
    def test_estimate_upper_bounds_exact_and_is_close(self, spark):
        from jsonschema_spark.operators.sketches import cms_build, cms_join_size

        a = spark.createDataFrame(
            [(str(i % 50),) for i in range(500)], "k string"
        )
        b = spark.createDataFrame(
            [(str(i % 100),) for i in range(300)], "k string"
        )
        est = cms_join_size(
            cms_build(a, "k", depth=4, width=4096),
            cms_build(b, "k", depth=4, width=4096),
        ).collect()[0]["est_rows"]
        exact = a.join(b, "k").count()
        assert est >= exact
        # at this load (550 items, width 4096) collisions are rare: tight
        assert est <= exact * 1.1

    def test_intersection_estimate(self, spark):
        from jsonschema_spark.operators.sketches import (
            hll_build,
            hll_intersect_estimate,
        )

        a = spark.range(0, 6_000).select(F.col("id").cast("string").alias("t"))
        b = spark.range(4_000, 10_000).select(F.col("id").cast("string").alias("t"))
        r = hll_intersect_estimate(hll_build(a, "t"), hll_build(b, "t")).collect()[0]
        # true overlap 2000 of 10000; inclusion-exclusion compounds 3 HLL
        # errors at m=256 (~6.5% each on 6-10k terms) -> generous band
        assert 500 < r["est_intersection"] < 3500
        assert r["est_union"] > max(r["est_a"], r["est_b"])
