"""Salted two-phase per-group top-n (operators/sampling.group_quota):
exactness vs a single-window reference on skewed groups, tie determinism,
and the plan gate (slim exchanges, no Python)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from jsonschema_spark.operators.sampling import group_quota


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _reference(df, n):
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("id"))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("id", F.col("grp").alias("grp"), "score", F.col("rank").cast("long").alias("rank"))
    )


def test_group_quota_matches_single_window_on_skew(spark):
    # one hot group (900 rows), two small ones; scores collide heavily so
    # the id tiebreak is exercised inside and across salt buckets
    rows = [(i, "hot", i % 7) for i in range(900)]
    rows += [(1000 + i, "small", i) for i in range(3)]
    rows += [(2000, "single", 5)]
    df = spark.createDataFrame(rows, "id long, grp string, score long")
    got = sorted(map(tuple, group_quota(df, "id", "grp", "score", n=5, salt_buckets=8).collect()))
    want = sorted(map(tuple, _reference(df, 5).collect()))
    assert got == want
    # hot group's winners: score 6 rows with the 5 lowest ids
    hot = [r for r in got if r[1] == "hot"]
    assert [r[0] for r in sorted(hot, key=lambda r: r[3])] == [6, 13, 20, 27, 34]


def test_group_quota_small_groups_pass_through(spark):
    df = spark.createDataFrame([(1, "g", 10), (2, "g", 20)], "id long, grp string, score long")
    got = {r["id"]: r["rank"] for r in group_quota(df, "id", "grp", "score", n=5).collect()}
    assert got == {2: 1, 1: 2}


def test_group_quota_plan_slim_exchanges_no_python(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    slim = docs.select("doc_id", F.col("lang").alias("grp"), F.col("n_chars").alias("score"))
    p = _plan(group_quota(slim, "doc_id", "grp", "score", n=3))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the exchanges must never carry the text payload column
    for seg in p.split("Exchange")[1:]:
        assert "text#" not in seg.splitlines()[0]
