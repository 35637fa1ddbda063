"""Streaming volume anomaly: per-window z-scores against the frozen
baseline must match hand-computed values; novel keys flag with NULL z;
the plan stays one watermarked streaming aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.streaming import stream_volume_anomaly

BASELINE = {"click": (10.0, 2.0), "view": (10.0, 2.0)}


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("anomaly_landing"))
    rows = []
    # window 0: click at baseline rate (10), view spiking (20)
    for i in range(10):
        rows.append(("2024-01-01 00:00:%02d.000" % i, "click"))
    for i in range(20):
        rows.append(("2024-01-01 00:00:%02d.500" % (i % 60), "view"))
    # window 1: novel key
    for i in range(3):
        rows.append(("2024-01-01 00:01:%02d.000" % i, "weird"))
    # sentinel far past both windows so append mode closes them
    rows.append(("2024-01-01 00:10:00.000", "click"))
    df = spark.createDataFrame(rows, "ts string, key string").select(
        F.col("ts").cast("timestamp").alias("ts"), "key"
    )
    df.write.mode("overwrite").parquet(base)
    return base, df.schema


def test_stream_volume_anomaly(spark, landing, tmp_path):
    base, schema = landing
    src = spark.readStream.schema(schema).parquet(base)
    out = stream_volume_anomaly(
        src, "ts", "key", BASELINE, window_duration="1 minute",
        watermark="0 seconds", z_thresh=3.0,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("vol_anom")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_vol_anom"))
        .start()
    )
    q.awaitTermination(120)
    rows = {r["key"]: r for r in spark.sql("select * from vol_anom").collect()}
    assert rows["click"]["n_events"] == 10
    assert rows["click"]["z"] == pytest.approx(0.0)
    assert not rows["click"]["anomalous"]
    assert rows["view"]["n_events"] == 20
    assert rows["view"]["z"] == pytest.approx(5.0)  # (20-10)/2
    assert rows["view"]["anomalous"]
    assert rows["weird"]["z"] is None and rows["weird"]["anomalous"]


def test_baseline_validation(spark):
    df = spark.createDataFrame([("2024-01-01 00:00:00", "a")], "ts string, key string")
    with pytest.raises(ValueError):
        stream_volume_anomaly(df, "ts", "key", {})
    with pytest.raises(ValueError):
        stream_volume_anomaly(df, "ts", "key", {"a": (1.0, 0.0)})
