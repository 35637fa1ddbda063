"""Bucketized point-in-interval (range) join.

Spark has no native band/interval join: `points JOIN iv ON ts >= s AND
ts < e` plans as BroadcastNestedLoopJoin when one side fits in a broadcast
and a full CartesianProduct when neither does — the classic big-big scale
trap. The scale-safe shape is block bucketing: every interval explodes to
the fixed-width time blocks it overlaps, every point maps to exactly ONE
block, and the join becomes an equi-join on block id plus a residual range
filter.

Why this survives 100 TB:
- Only the INTERVAL side is amplified, by ceil(len / bucket) + 1 rows per
  interval — pick `bucket_seconds` near the typical interval length and the
  factor stays ~2. The point/fact side (the petabyte side) is never
  exploded.
- Each point carries exactly one block id, so a (point, interval) match is
  produced exactly once — no post-join dedup pass.
- The equi-join on block id shuffles both sides on a uniformly-spaced key;
  a hot block (event spike) is ordinary join skew that AQE's skew-join
  splitting handles, unlike a nested-loop probe which cannot be split.

Timestamps are compared in integer microseconds (same NTZ-epoch
`timestampdiff` as operators/sessions.py, `epoch_us` in DuckDB oracles) so
interval boundaries are exact across engines. Intervals are HALF-OPEN
[start, end): an event exactly at `end` does not match, so back-to-back
windows partition the timeline without double-counting.

Reference analogue: none (event-analytics / pipeline extension, task spec).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_points", "merge_intervals"]


def _epoch_us(ts_col: str) -> Column:
    """Integer microseconds since the epoch, timezone-free (handles both
    TIMESTAMP and TIMESTAMP_NTZ; matches DuckDB epoch_us on naive values)."""
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast(`{ts_col}` as timestamp_ntz))"
    )


def _floordiv(col: Column, divisor: int) -> Column:
    """Exact floor division on integral columns (negative-safe: `div`
    truncates toward zero, so subtract the non-negative pmod first)."""
    d = F.lit(int(divisor))
    return ((col - F.pmod(col, d)) / d).cast("long")


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    *,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 1800,
) -> DataFrame:
    """Inner-join each point row to every interval row whose half-open
    window [start, end) contains the point's timestamp.

    Output: the point columns followed by the interval columns (minus the
    staging block/micros columns). Empty or inverted intervals (end <=
    start) match nothing. Column names must not collide between the two
    inputs (rename before calling).
    """
    b_us = int(bucket_seconds) * 1_000_000
    p = points.withColumn("_p_us", _epoch_us(ts_col)).withColumn(
        "_blk", _floordiv(F.col("_p_us"), b_us)
    )
    iv = (
        intervals.withColumn("_s_us", _epoch_us(start_col))
        .withColumn("_e_us", _epoch_us(end_col))
        .filter(F.col("_e_us") > F.col("_s_us"))
        .withColumn(
            "_blk",
            F.explode(
                F.sequence(
                    _floordiv(F.col("_s_us"), b_us),
                    _floordiv(F.col("_e_us") - 1, b_us),
                )
            ),
        )
    )
    matched = p.join(iv, "_blk").filter(
        (F.col("_p_us") >= F.col("_s_us")) & (F.col("_p_us") < F.col("_e_us"))
    )
    return matched.drop("_blk", "_p_us", "_s_us", "_e_us")


def merge_intervals(
    df: "DataFrame",
    *,
    key_col: str,
    start_col: str,
    end_col: str,
) -> "DataFrame":
    """Interval union (gaps-and-islands): coalesce overlapping or touching
    half-open [start, end) intervals per key into maximal disjoint
    islands — the algebra behind redaction-span flattening, activity/
    downtime coverage, and validity-interval compaction. Returns one row
    per island: (key, island, start, end, n_src).

    Touching intervals ([a,b) + [b,c)) merge; a gap of ≥1 unit starts a
    new island. Bounds must be integer-comparable (epoch micros, offsets)
    so island detection is exact in any engine.

    Scale shape: ONE hash exchange on the key; the running max of
    interval ends and the island counter are two stacked window
    aggregates over the same (key, start, end) sort — same skew contract
    as `sessions.sessionize` (the unit is the hottest key; salting would
    split islands, bound per-key interval counts upstream instead)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = (
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end)
    ).cast("bigint")
    staged = df.select(
        F.col(key_col).alias("key"),
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        new_island.alias("_new"),
    )
    w2 = Window.partitionBy("key").orderBy("_s", "_e")
    with_island = staged.withColumn("island", F.sum("_new").over(w2))
    return with_island.groupBy("key", "island").agg(
        F.min("_s").alias("start"),
        F.max("_e").alias("end"),
        F.count(F.lit(1)).alias("n_src"),
    )
