"""Streaming per-window HyperLogLog sketches: distinct-count registers as
a continuously-emitted relation.

The batch sketch (operators/sketches.hll_build) turns a table into ≤ m
(reg, max_rho) rows; the streaming form does the same per event-time
window in ONE watermarked aggregation — groupBy(window, reg) + max(rho).
That is a stateless-per-key max (no applyInPandasWithState, no
stream-stream join): state is bounded by windows-in-flight × m registers,
and a window's registers emit exactly once when the watermark closes it
(append mode). Downstream, the emitted register rows are the SAME monoid
as the batch sketch — `hll_merge` unions window sketches into
hour/day/month rollups and `hll_estimate` prices any union without ever
re-reading events. Stream registers == batch registers over the same rows
(pinned by test): a backfill computed in batch and a live stream land in
one sketch store with no dual-write skew.

Reference analogue: none (streaming extension; batch HLL mirrors the
reference suite's cardinality checks — see operators/stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.sketches import _hll_rho

__all__ = ["stream_hll_windows"]


def stream_hll_windows(
    stream_df: DataFrame,
    ts_col: str,
    term_col: str,
    *,
    window_duration: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """(window_start, window_end, reg, max_rho) per event-time window —
    the per-window HLL register relation of `term_col`. Late rows beyond
    the watermark are dropped (same contract as the other streaming
    metrics)."""
    h = F.md5(F.concat(F.lit("hll:"), F.col(term_col).cast("string")))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rho = _hll_rho(F.substring(h, 3, 30))
    staged = (
        stream_df.where(F.col(term_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(F.col(ts_col), reg.alias("reg"), rho.alias("rho"))
    )
    return (
        staged.groupBy(F.window(ts_col, window_duration), "reg")
        .agg(F.max("rho").alias("max_rho"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "reg",
            "max_rho",
        )
    )
