"""Column-distribution profiling operators (operators/profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.profile import (
    approx_quantiles,
    heavy_hitters,
    histogram,
    quantiles,
)


def test_histogram_counts_and_empty_bins(spark):
    df = spark.createDataFrame([(float(v),) for v in [0, 1, 2, 3, 10]] + [(None,)], "x double")
    out = histogram(df, "x", n_bins=5).orderBy("bin").collect()
    assert [r["bin"] for r in out] == [0, 1, 2, 3, 4]
    # width 2: [0,2) -> {0,1}, [2,4) -> {2,3}, top bin closed -> {10}; null dropped
    assert [r["cnt"] for r in out] == [2, 2, 0, 0, 1]
    assert sum(r["cnt"] for r in out) == 5
    assert out[0]["bin_lo"] == 0.0 and out[-1]["bin_hi"] == 10.0


def test_histogram_max_value_lands_in_top_bin(spark):
    df = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    out = {r["bin"]: r["cnt"] for r in histogram(df, "x", n_bins=4).collect()}
    assert out[3] == 1  # max is inside the closed top edge, not bin 4


def test_histogram_degenerate_domain(spark):
    df = spark.createDataFrame([(7.0,)] * 3, "x double")
    out = histogram(df, "x", n_bins=4).orderBy("bin").collect()
    assert sum(r["cnt"] for r in out) == 3


def test_quantiles_exact_interpolation(spark):
    # n=5 values 10..50: type-7 h = p*(n-1); p=0.25 -> h=1.0 -> exactly 20
    df = spark.createDataFrame([(v,) for v in [10.0, 20.0, 30.0, 40.0, 50.0]], "x double")
    rows = {r["prob"]: r["value"] for r in quantiles(df, ["x"], [0.25, 0.5, 0.9]).collect()}
    assert rows[0.25] == 20.0
    assert rows[0.5] == 30.0
    assert rows[0.9] == pytest.approx(46.0)  # h=3.6 -> 40 + 0.6*10


def test_approx_quantiles_error_bound(spark):
    n = 20000
    df = spark.range(n).select((F.col("id") + 1).cast("double").alias("x"))
    probs = [0.1, 0.5, 0.9, 0.99]
    exact = {(r["column"], r["prob"]): r["value"] for r in quantiles(df, ["x"], probs).collect()}
    approx = {
        (r["column"], r["prob"]): r["value"]
        for r in approx_quantiles(df, ["x"], probs, accuracy=1000).collect()
    }
    for key, ev in exact.items():
        # rank error <= n/accuracy = 20 rows -> value error <= 20 on this ramp
        assert abs(approx[key] - ev) <= n / 1000 + 1


def test_heavy_hitters_deterministic_tiebreak(spark):
    data = ["a"] * 3 + ["c"] * 2 + ["b"] * 2 + ["d"]
    df = spark.createDataFrame([(v,) for v in data], "v string")
    out = heavy_hitters(df, "v", k=3).orderBy("rank").collect()
    # b and c tie on cnt=2 -> value asc breaks it
    assert [(r["value"], r["cnt"], r["rank"]) for r in out] == [
        ("a", 3, 1),
        ("b", 2, 2),
        ("c", 2, 3),
    ]


def test_heavy_hitters_excludes_nulls(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "v string")
    out = heavy_hitters(df, "v", k=5).collect()
    assert [(r["value"], r["cnt"]) for r in out] == [("a", 2)]


def test_column_stats_single_pass(spark):
    """The wide-agg rewrite: one scan, long-form output, null_rate right."""
    from jsonschema_spark.operators.stats import column_stats

    df = spark.createDataFrame([(1, None), (2, "x"), (3, "y"), (4, None)], "a int, b string")
    rows = {r["column"]: r for r in column_stats(df).collect()}
    assert rows["a"]["n_rows"] == 4 and rows["a"]["n_present"] == 4
    assert rows["a"]["min_value"] == "1" and rows["a"]["max_value"] == "4"
    assert rows["b"]["n_present"] == 2 and rows["b"]["null_rate"] == pytest.approx(0.5)
    # exactly ONE scan of the source in the plan
    plan = column_stats(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") <= 1
