"""Streaming per-window HLL (streaming/sketch_stream.stream_hll_windows):
stream-emitted registers must equal the batch sketch over the same rows
per window, and merging the window sketches must equal the batch sketch
of everything (the monoid property end-to-end across the batch/stream
boundary)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.sketches import hll_build, hll_merge
from jsonschema_spark.streaming.sketch_stream import stream_hll_windows


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("hll_landing"))
    rows = []
    for i in range(400):
        rows.append(("2024-01-01 00:00:%02d.%03d" % (i % 60, i), i % 150))
    for i in range(400):
        rows.append(("2024-01-01 00:01:%02d.%03d" % (i % 60, i), 100 + i % 200))
    # sentinel far past both windows so append mode emits them
    rows.append(("2024-01-01 00:10:00.000", 0))
    df = spark.createDataFrame(rows, "ts string, uid long").select(
        F.col("ts").cast("timestamp").alias("ts"), "uid"
    )
    df.write.mode("overwrite").parquet(base)
    return base, df.schema


def _run(spark, tmp_path, out_df, name):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").collect()


def test_stream_registers_match_batch_per_window(spark, landing, tmp_path):
    base, schema = landing
    stream = spark.readStream.schema(schema).parquet(base)
    out = stream_hll_windows(
        stream, "ts", "uid", window_duration="1 minute", watermark="0 seconds"
    )
    rows = _run(spark, tmp_path, out, "hll_win")
    emitted = {}
    for r in rows:
        emitted.setdefault(str(r["window_start"]), set()).add(
            (r["reg"], r["max_rho"])
        )
    assert len(emitted) == 2  # sentinel window stays open

    batch = spark.read.parquet(base)
    for wstart, regset in emitted.items():
        wdf = batch.where(
            (F.col("ts") >= wstart)
            & (F.col("ts") < F.expr(f"timestamp'{wstart}' + interval 1 minute"))
        )
        direct = {
            (r["reg"], r["max_rho"]) for r in hll_build(wdf, "uid").collect()
        }
        assert regset == direct, f"window {wstart} registers diverge"


def test_window_sketches_merge_to_whole(spark, landing, tmp_path):
    base, schema = landing
    stream = spark.readStream.schema(schema).parquet(base)
    out = stream_hll_windows(
        stream, "ts", "uid", window_duration="1 minute", watermark="0 seconds"
    )
    rows = _run(spark, tmp_path, out, "hll_win_merge")
    emitted = spark.createDataFrame(
        [(r["reg"], r["max_rho"]) for r in rows], "reg int, max_rho int"
    )
    merged = {(r["reg"], r["max_rho"]) for r in hll_merge(emitted).collect()}
    # batch sketch over exactly the rows the watermark emitted (both closed
    # windows; the sentinel's window never emitted)
    batch = spark.read.parquet(base).where(
        F.col("ts") < F.lit("2024-01-01 00:02:00").cast("timestamp")
    )
    direct = {(r["reg"], r["max_rho"]) for r in hll_build(batch, "uid").collect()}
    assert merged == direct


# --------------------------------------------------- streaming zone maps

@pytest.fixture(scope="module")
def zm_landing(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zm_landing"))
    rows = []
    for i in range(300):
        v = float(100 + (i * 13) % 400)
        rows.append(("2024-01-01 00:00:%02d.%03d" % (i % 60, i), v if i % 7 else None))
    for i in range(300):
        v = float(500 + (i * 11) % 300)
        rows.append(("2024-01-01 00:01:%02d.%03d" % (i % 60, i), v))
    rows.append(("2024-01-01 00:10:00.000", 1.0))  # sentinel closes windows
    df = spark.createDataFrame(rows, "ts string, val double").select(
        F.col("ts").cast("timestamp").alias("ts"), "val"
    )
    df.write.mode("overwrite").parquet(base)
    return base, df.schema


def test_stream_zone_maps_match_batch_per_window(spark, zm_landing, tmp_path):
    from jsonschema_spark.operators.layout import zone_map_stats
    from jsonschema_spark.streaming.sketch_stream import stream_zone_maps

    base, schema = zm_landing
    stream = spark.readStream.schema(schema).parquet(base)
    out = stream_zone_maps(
        stream, "ts", ["val"], window_duration="1 minute", watermark="0 seconds"
    )
    rows = _run(spark, tmp_path, out, "zm_win")
    assert len(rows) == 2  # sentinel window stays open

    batch = spark.read.parquet(base)
    for r in rows:
        wstart = str(r["window_start"])
        wdf = batch.where(
            (F.col("ts") >= wstart)
            & (F.col("ts") < F.expr(f"timestamp'{wstart}' + interval 1 minute"))
        )
        direct = zone_map_stats(
            wdf.withColumn("file", F.lit(0)), file_col="file", value_cols=["val"]
        ).collect()[0]
        assert (r["vmin"], r["vmax"], r["n_rows"], r["n_null"]) == (
            direct["vmin"], direct["vmax"], direct["n_rows"], direct["n_null"]
        ), f"window {wstart} stats diverge"


def test_stream_zone_maps_merge_to_table_grain(spark, zm_landing, tmp_path):
    from jsonschema_spark.operators.layout import zone_map_stats
    from jsonschema_spark.streaming.sketch_stream import stream_zone_maps

    base, schema = zm_landing
    stream = spark.readStream.schema(schema).parquet(base)
    out = stream_zone_maps(
        stream, "ts", ["val"], window_duration="1 minute", watermark="0 seconds"
    )
    rows = _run(spark, tmp_path, out, "zm_win_merge")
    emitted = spark.createDataFrame(
        [(r["vmin"], r["vmax"], r["n_rows"], r["n_null"]) for r in rows],
        "vmin double, vmax double, n_rows long, n_null long",
    )
    merged = emitted.agg(
        F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax"),
        F.sum("n_rows").alias("n_rows"), F.sum("n_null").alias("n_null"),
    ).collect()[0]
    batch = spark.read.parquet(base).where(
        F.col("ts") < F.lit("2024-01-01 00:02:00").cast("timestamp")
    )
    direct = zone_map_stats(
        batch.withColumn("file", F.lit(0)), file_col="file", value_cols=["val"]
    ).collect()[0]
    assert (merged["vmin"], merged["vmax"], merged["n_rows"], merged["n_null"]) == (
        direct["vmin"], direct["vmax"], direct["n_rows"], direct["n_null"]
    )
