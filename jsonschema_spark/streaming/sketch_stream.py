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

__all__ = ["stream_hll_windows", "stream_zone_maps"]


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


def stream_zone_maps(
    stream_df: DataFrame,
    ts_col: str,
    value_cols: list,
    *,
    window_duration: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Ingest-time zone-map collection: per event-time window, the
    min/max/count/null statistics of each value column — the footer/
    manifest stats an Iceberg-style writer records at commit, computed in
    the SAME watermarked aggregation that writes the window (min/max/sum
    are all streaming-safe monoids, so state is bounded by
    windows-in-flight and a window's stats row emits exactly once in
    append mode). Emitted rows are the batch `layout.zone_map_stats`
    monoid: window stats merge to partition/table grain with
    min/min, max/max, sum/sum — a backfilled batch zone map and the live
    stream land in one stats store with no dual-write skew (pinned by
    test). Output: (window_start, window_end, column, vmin, vmax,
    n_rows, n_null)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in value_cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"_null_{c}"),
        ]
    per_window = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration))
        .agg(*aggs)
    )
    tall = None
    for c in value_cols:
        part = per_window.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.lit(c).alias("column"),
            F.col(f"_min_{c}").alias("vmin"),
            F.col(f"_max_{c}").alias("vmax"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
        )
        tall = part if tall is None else tall.unionByName(part)
    return tall
