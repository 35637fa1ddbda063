"""Z-order key (operators/layout.zorder_key): Morton-interleave laws —
bit-exact reference parity, locality (z-range bounds both dims), clamp
behavior, and the pure-projection plan."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.layout import zorder_key


def _morton(x: int, y: int, bits: int = 8) -> int:
    x = max(0, min(x, (1 << bits) - 1))
    y = max(0, min(y, (1 << bits) - 1))
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 70, 7) for y in range(0, 70, 11)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select("x", "y", zorder_key(F.col("x"), F.col("y"), bits=6).alias("z")).collect()
    for r in out:
        assert r["z"] == _morton(r["x"], r["y"], bits=6), (r["x"], r["y"])


def test_locality_bounds_both_dimensions(spark):
    # within one z-bucket of 2^(2k) consecutive keys, each dim spans <= 2^k
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    agg = (
        df.select("x", "y", zorder_key(F.col("x"), F.col("y"), bits=6).alias("z"))
        .withColumn("bucket", F.shiftright("z", 6))  # 64-key ranges -> 2^3 per dim
        .groupBy("bucket")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert agg and all(r["dx"] <= 7 and r["dy"] <= 7 for r in agg)


def test_clamping_saturates(spark):
    df = spark.createDataFrame([(-5, 9999)], "x long, y long")
    z = df.select(zorder_key(F.col("x"), F.col("y"), bits=4).alias("z")).collect()[0]["z"]
    assert z == _morton(0, 15, bits=4)


def test_key_is_pure_projection(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = (
        li.select(zorder_key(F.col("l_quantity"), F.col("l_partkey"), bits=8))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
