"""Gap-based sessionization and as-of attribution over event streams.

Two classic large-scale pipeline operators the reference has no analogue
for (training-data / telemetry extension, task spec):

- `sessionize`: split each user's event stream into sessions wherever the
  gap between consecutive events exceeds a threshold, then aggregate one
  row per session. ONE hash exchange on the user key: the ordered window
  and the (user, session_seq) aggregate both cluster on user, and Spark's
  EnsureRequirements recognises that HashPartitioning(user) satisfies the
  compound grouping (all rows of a session live on one partition), so the
  groupBy reuses the window's shuffle instead of adding a second one.

- `asof_attribute`: for every "left"-kind event (e.g. click), find the most
  recent "right"-kind event (e.g. view) at-or-before it for the same user —
  an as-of join. Implemented as the union-tag trick: tag both kinds into one
  stream, order by (time, kind, id) with the right kind sorting first on
  ties, and carry `last(right_id, ignorenulls)` down the window. No range
  join, no per-row probe, no row amplification — a single exchange on the
  user key regardless of how many right-events precede each left-event.

Timestamps are compared in integer microseconds (NTZ-epoch `timestampdiff`
here, `epoch_us` in the DuckDB oracles) so gap boundaries are exact across
engines. Skew note for 10^12-row streams: both operators need all of a
user's rows in one task, so the skew unit is the single hottest user, not
the key distribution — bound per-user event counts upstream (or pre-split
robot users by day) rather than salting, which would break the window
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "asof_attribute"]


def _epoch_us(ts_col: str):
    """Integer microseconds since the epoch, timezone-free.

    `unix_micros` rejects TIMESTAMP_NTZ (the type parquet naive timestamps
    load as); diffing against an NTZ epoch literal handles both flavors and
    matches DuckDB's `epoch_us` on naive timestamps exactly."""
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast(`{ts_col}` as timestamp_ntz))"
    )


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """One row per (user, session): event count, start/end micros, and the
    session's summed value (if `value_col` given, rounded to 6 places so the
    float sum is engine-stable).

    A session breaks when the gap to the previous event exceeds
    `gap_seconds` (strictly greater — an event exactly `gap_seconds` after
    its predecessor extends the session). `id_col` breaks timestamp ties so
    the ordering, and therefore the session numbering, is total and
    deterministic.
    """
    gap_us = int(gap_seconds) * 1_000_000
    # Stage integer micros first so BOTH windows share one partitioning AND
    # one ordering — Spark plans a single Exchange + a single Sort for the
    # lag and the running sum.
    staged = events.select(
        F.col(user_col),
        F.col(id_col),
        _epoch_us(ts_col).alias("_us"),
        *([F.col(value_col)] if value_col else []),
    )
    w = Window.partitionBy(user_col).orderBy("_us", id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prev = F.lag("_us").over(w)
    marked = staged.withColumn(
        "_new",
        (prev.isNull() | (F.col("_us") - prev > F.lit(gap_us))).cast("int"),
    )
    sess = marked.select(
        user_col,
        "_us",
        *([value_col] if value_col else []),
        F.sum("_new").over(run).alias("session_seq"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("total_value"))
    return sess.groupBy(user_col, "session_seq").agg(*aggs)


def asof_attribute(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    kind_col: str = "event_type",
    left_kind: str = "click",
    right_kind: str = "view",
) -> DataFrame:
    """As-of join within one stream: for each `left_kind` event, the id of
    the latest `right_kind` event at-or-before it for the same user, plus
    the gap in microseconds (both NULL when no prior right-event exists).

    At-or-before: on an exact timestamp tie the right-event wins (sorts
    first), so a view and a click in the same microsecond attribute the
    click to that view. Output: (user, click_id, view_id, gap_us) with the
    left id under `left_id` and right under `right_id`.
    """
    us = _epoch_us(ts_col)
    is_left = F.col(kind_col) == F.lit(left_kind)
    tagged = events.filter(F.col(kind_col).isin([left_kind, right_kind])).select(
        F.col(user_col),
        F.col(id_col),
        us.alias("_us"),
        is_left.cast("int").alias("_left"),
        F.when(~is_left, F.col(id_col)).alias("_rid"),
        F.when(~is_left, us).alias("_rus"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("_us", "_left", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        user_col,
        id_col,
        "_us",
        "_left",
        F.last("_rid", ignorenulls=True).over(w).alias("right_id"),
        F.last("_rus", ignorenulls=True).over(w).alias("_right_us"),
    )
    return carried.filter(F.col("_left") == 1).select(
        F.col(user_col),
        F.col(id_col).alias("left_id"),
        F.col("right_id"),
        (F.col("_us") - F.col("_right_us")).alias("gap_us"),
    )
