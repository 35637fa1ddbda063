"""Streaming referential integrity (streaming/referential_stream.py)."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.referential import referential_violations
from jsonschema_spark.streaming.referential_stream import (
    stream_referential_metrics,
    stream_referential_violations,
)


def _setup(spark, tmp_path):
    land = str(tmp_path / "land")
    rows = [("e1", "m1"), ("e2", "m2"), ("e3", "mX"), ("e4", None), ("e5", "mY")]
    (
        spark.createDataFrame(rows, "event_id string, media_ref string")
        .withColumn("ingest_ts", F.current_timestamp())
        .write.mode("overwrite")
        .parquet(land)
    )
    catalog = spark.createDataFrame([("m1",), ("m2",), ("m3",)], "media_id string")
    return land, spark.read.parquet(land).schema, catalog


def test_stream_violations_match_batch(spark, tmp_path):
    land, schema, catalog = _setup(spark, tmp_path)
    stream = spark.readStream.schema(schema).parquet(land)
    q = (
        stream_referential_violations(stream, "media_ref", catalog, "media_id")
        .writeStream.format("memory")
        .queryName("ref_viol")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"] for r in spark.sql("select * from ref_viol").collect()}
    want = {
        r["event_id"]
        for r in referential_violations(
            spark.read.parquet(land), "media_ref", catalog, "media_id"
        ).collect()
    }
    assert got == want == {"e3", "e5"}  # null FK never dangles


def test_stream_metrics_counts_and_rate(spark, tmp_path):
    land, schema, catalog = _setup(spark, tmp_path)
    stream = spark.readStream.schema(schema).parquet(land)
    q = (
        stream_referential_metrics(
            stream, "media_ref", catalog, "media_id", "ingest_ts"
        )
        .writeStream.format("memory")
        .queryName("ref_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ref_metrics").collect()
    assert sum(r["n_rows"] for r in rows) == 5
    assert sum(r["n_dangling"] for r in rows) == 2
    for r in rows:
        assert abs(r["dangling_rate"] - r["n_dangling"] / r["n_rows"]) < 1e-12
