"""Streaming session windows: stream/batch parity and boundary semantics."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from jsonschema_spark.streaming.sessions_stream import stream_sessionize

T0 = datetime(2024, 1, 1, 0, 0, 0)
DDL = "event_id bigint, ts timestamp, user_id bigint, value double"


def _rows():
    # user 7: two sessions (gap of 10 min, then a 45-min hole, then one more)
    # user 8: one single-event session
    return [
        (1, T0, 7, 1.0),
        (2, T0 + timedelta(minutes=10), 7, 2.0),
        (3, T0 + timedelta(minutes=70), 7, 4.0),
        (4, T0 + timedelta(minutes=5), 8, 8.0),
    ]


def test_stream_matches_batch_session_windows(spark, tmp_path):
    batch_df = spark.createDataFrame(_rows(), DDL)
    base = str(tmp_path / "landing")
    batch_df.write.mode("overwrite").parquet(base)

    want = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["total_value"])
        for r in stream_sessionize(batch_df, gap="30 minutes", value_col="value").collect()
    }
    assert len(want) == 3

    stream = spark.readStream.schema(batch_df.schema).parquet(base)
    out = stream_sessionize(stream, gap="30 minutes", watermark="0 seconds", value_col="value")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from sessions_stream").collect()
    }
    assert got == want


def test_exact_gap_boundary_agrees_with_batch_operator(spark):
    # session_window merges windows that overlap OR touch: an event exactly
    # `gap` later extends the session — the same strictly-greater break as
    # operators/sessions.sessionize, so the batch and streaming formulations
    # agree at the boundary.
    rows = [(1, T0, 7, 1.0), (2, T0 + timedelta(minutes=30), 7, 1.0)]
    out = stream_sessionize(
        spark.createDataFrame(rows, DDL), gap="30 minutes"
    ).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2
    just_over = [(1, T0, 7, 1.0), (2, T0 + timedelta(minutes=30, microseconds=1), 7, 1.0)]
    out2 = stream_sessionize(
        spark.createDataFrame(just_over, DDL), gap="30 minutes"
    ).collect()
    assert len(out2) == 2


def test_session_end_is_last_event_plus_gap(spark):
    rows = [(1, T0, 7, 1.0), (2, T0 + timedelta(minutes=10), 7, 1.0)]
    [r] = stream_sessionize(spark.createDataFrame(rows, DDL), gap="30 minutes").collect()
    assert r["session_start"] == T0
    assert r["session_end"] == T0 + timedelta(minutes=40)
