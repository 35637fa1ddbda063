"""Count-min sketch: upper-bound property, exactness at low load,
mergeability, plan shape."""

from __future__ import annotations

import pytest

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
