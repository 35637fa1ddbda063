"""Streaming sessionization: Spark-native session windows over an event
stream.

The batch operator (`operators/sessions.sessionize`) numbers sessions with
an ordered window — fine for bounded input, impossible unbounded. The
streaming shape is Spark's own merging session window
(`F.session_window(ts, gap)`): state is one open window per (user, window),
windows merge as events arrive, and the WATERMARK is what bounds state — a
session window finalizes (and its state evicts) once the watermark passes
its close. Without a watermark the state store grows with every user ever
seen, so `watermark` is a required argument here, not an option.

Boundary note: Spark merges session windows that overlap OR touch, so an
event exactly `gap` after its predecessor EXTENDS the session — the same
strictly-greater-than-gap break the batch operator
(`operators/sessions.sessionize`) uses; `tests/test_sessions_stream.py`
pins the agreement at the boundary.

Reference analogue: none (streaming extension; the reference is batch-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_sessionize"]


def stream_sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str | None = None,
) -> DataFrame:
    """One output row per finalized (user, session window): event count,
    window start/end, summed value. Works identically on batch frames
    (useful for parity tests); on streams, `watermark` bounds the session
    state store and determines when windows finalize.

    The groupBy keys on (session_window, user) — a single hash exchange on
    the user key plus the window-merge, both handled by Spark's
    session-window aggregation operator (state-store backed on streams,
    sort-based merge in batch).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("total_value"))
    out = df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"),
        F.col(user_col),
    ).agg(*aggs)
    return out.select(
        user_col,
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        "n_events",
        *(["total_value"] if value_col else []),
    )
