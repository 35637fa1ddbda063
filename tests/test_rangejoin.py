"""Unit semantics for the bucketized range join and the new sampling /
profiling operators (weighted_sample_topk, key_candidates)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def _ts(minute: int, second: int = 0, micro: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


def test_range_join_half_open_boundaries(spark):
    from jsonschema_spark.operators.rangejoin import range_join_points

    points = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(15)), (3, _ts(29, 59, 999999)), (4, _ts(30))],
        "pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, _ts(0), _ts(30))], "window_id int, start_ts timestamp, end_ts timestamp"
    )
    got = sorted(
        r.pid
        for r in range_join_points(points, intervals, bucket_seconds=600).collect()
    )
    # start inclusive, end exclusive: the _ts(30) point does NOT match
    assert got == [1, 2, 3]


def test_range_join_interval_spanning_many_buckets(spark):
    from jsonschema_spark.operators.rangejoin import range_join_points

    # 90-minute interval over 10-minute buckets: exploded to 9 blocks, but
    # each matching point must appear exactly once.
    points = spark.createDataFrame(
        [(i, _ts(i * 7)) for i in range(8)], "pid int, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(1, _ts(5), dt.datetime(2024, 1, 1, 1, 35))],
        "window_id int, start_ts timestamp, end_ts timestamp",
    )
    rows = range_join_points(points, intervals, bucket_seconds=600).collect()
    pids = sorted(r.pid for r in rows)
    assert pids == [1, 2, 3, 4, 5, 6, 7]  # each once — no bucket-dup
    assert len(pids) == len(set(pids))


def test_range_join_empty_and_inverted_intervals_match_nothing(spark):
    from jsonschema_spark.operators.rangejoin import range_join_points

    points = spark.createDataFrame([(1, _ts(10))], "pid int, ts timestamp")
    intervals = spark.createDataFrame(
        [(1, _ts(10), _ts(10)), (2, _ts(20), _ts(5))],
        "window_id int, start_ts timestamp, end_ts timestamp",
    )
    assert range_join_points(points, intervals, bucket_seconds=600).count() == 0


def test_range_join_floordiv_negative_safe():
    from jsonschema_spark.operators.rangejoin import _floordiv

    # pre-epoch timestamps land in the correct (negative) block
    import pyspark.sql.functions as F  # noqa: F811

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.range(1).select(
        _floordiv(F.lit(-1).cast("long"), 600_000_000).alias("b"),
        _floordiv(F.lit(-600_000_000).cast("long"), 600_000_000).alias("b2"),
        _floordiv(F.lit(599_999_999).cast("long"), 600_000_000).alias("b3"),
    )
    r = df.collect()[0]
    assert (r.b, r.b2, r.b3) == (-1, -1, 0)


def test_weighted_sample_topk_matches_reference_formula(spark):
    from jsonschema_spark.operators.sampling import weighted_sample_topk

    rows = [(i, float(1 + (i * 37) % 100)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r.doc_id for r in weighted_sample_topk(df, "doc_id", "w", 25).collect()]

    # independent python reproduction of u = md5-fraction, score = ln(u)/w
    import hashlib

    def frac(key):
        h = hashlib.md5(f"wsample{key}".encode()).hexdigest()
        return int(h[:15], 16) / float(1 << 60)

    exp = sorted(rows, key=lambda r: (-(math.log(frac(r[0])) / r[1]), r[0]))[:25]
    assert sorted(got) == sorted(r[0] for r in exp)


def test_weighted_sample_topk_excludes_nonpositive_weights(spark):
    from jsonschema_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], "doc_id long, w double"
    )
    got = [r.doc_id for r in weighted_sample_topk(df, "doc_id", "w", 10).collect()]
    assert got == [1]


def test_weighted_sample_bias_toward_heavy_rows(spark):
    from jsonschema_spark.operators.sampling import weighted_sample_topk

    # 100 heavy rows (w=50) vs 900 light rows (w=1): with k=100, heavy rows
    # should dominate the sample by construction of A-ES.
    rows = [(i, 50.0 if i < 100 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r.doc_id for r in weighted_sample_topk(df, "doc_id", "w", 100).collect()]
    heavy = sum(1 for d in got if d < 100)
    assert heavy > 60  # expectation ~85; far above the no-bias baseline ~10


def test_key_candidates_exact(spark):
    from jsonschema_spark.operators.profile import key_candidates

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.0), (3, "b", 2.0)],
        "id long, grp string, v double",
    )
    rows = {r.col_name: r for r in key_candidates(df).collect()}
    assert rows["id"].is_key and rows["id"].n_distinct == 3 and rows["id"].n_null == 0
    assert not rows["grp"].is_key and rows["grp"].n_distinct == 2
    assert not rows["v"].is_key and rows["v"].n_null == 1
    assert all(r.n_rows == 3 for r in rows.values())


def test_key_candidates_approx_mode(spark):
    from jsonschema_spark.operators.profile import key_candidates

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 10).alias("m"))
    rows = {r.col_name: r for r in key_candidates(df, approx=True).collect()}
    # HLL estimates: id near 1000, m near 10 (2% default error)
    assert abs(rows["id"].n_distinct - 1000) <= 40
    assert abs(rows["m"].n_distinct - 10) <= 2
