"""Hypertable-style time-bucket rollup (with gap-fill), ordered funnel
analysis, and retention cohorts over event streams.

Three classic time-series / product-analytics operators the reference has
no analogue for (training-data / telemetry extension, task spec — the
"hypertable rollup" custom-operator family):

- `time_bucket_rollup`: aggregate events into fixed-width time buckets per
  key, then GAP-FILL so every (key, bucket) in the observed range emits a
  row even when no event landed in it (TimescaleDB's
  ``time_bucket_gapfill`` semantics). One hash exchange on
  (key, bucket) for the aggregation; the fill spine is built from the
  ALREADY-AGGREGATED output (distinct keys × a `sequence()` of bucket
  indices), so its size is #keys × #buckets regardless of raw row count —
  at 10^12 events the spine is still thousands of rows, and AQE broadcasts
  it into the left join.

- `funnel_steps`: how many users complete step1 → step2 → step3 in strict
  time order (each step strictly after the previous one — the classic
  ordered funnel). Computed in ONE exchange on the user key: chained
  `min(CASE ...) OVER (PARTITION BY user)` windows (step k's minimum is
  conditioned on step k-1's, so they stack as successive projections over
  the same partitioning — Spark plans one Exchange and no Sort, since none
  of the windows orders), then a user-level groupBy that reuses the same
  partitioning, then a 3-row summary.

- `retention_cohorts`: cohort users by the week of their first event and
  count distinct users active k weeks later — the standard retention
  triangle. Two exchanges by construction (user-level first-touch, then
  the cohort×offset distinct count); the first-touch aggregate and the
  events-to-first-touch join share the user partitioning.

Timestamps are compared in integer microseconds (NTZ-epoch `timestampdiff`
here, `epoch_us` in the DuckDB oracles) and bucket/week indices use integer
division, so bucket boundaries are exact across engines. Skew note for
10^12-row streams: the rollup's skew unit is the hottest (key, bucket)
cell — partial aggregation (map-side combine) absorbs it; the funnel and
retention operators cluster on user like `sessions.sessionize`, so the
skew unit is the single hottest user — bound per-user event counts
upstream rather than salting, which would break the per-user semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.sessions import _epoch_us

__all__ = ["time_bucket_rollup", "funnel_steps", "retention_cohorts"]

_US = 1_000_000
_WEEK_US = 7 * 86_400 * _US


def time_bucket_rollup(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 900,
    gap_fill: bool = True,
) -> DataFrame:
    """Per-(key, bucket) event count and summed value, one row per bucket.

    Buckets are ``floor(epoch_us / bucket_us)``; the output carries the
    bucket's start in epoch seconds (`bucket_start_s`). With `gap_fill`,
    every key emits a row for EVERY bucket in the global [min, max] bucket
    range (count 0, value 0.0) — the shape a downstream chart or drift
    check wants, with no client-side densification.

    Scale shape: the only full-data exchange is the (key, bucket) groupBy,
    which partial-aggregates map-side. Bounds, the key list, and the spine
    all derive from the aggregated output (#keys × #buckets rows); the
    spine→agg left join broadcasts under AQE.
    """
    bucket_us = int(bucket_seconds) * _US
    agg = (
        events.select(
            F.col(key_col).alias("key"),
            F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
                f"cast(`{ts_col}` as timestamp_ntz)) div {bucket_us}"
            ).alias("bucket"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("_v"), 6).alias("total_value"),
        )
    )
    if not gap_fill:
        return agg.select(
            F.col("key").alias(key_col),
            (F.col("bucket") * F.lit(int(bucket_seconds))).alias("bucket_start_s"),
            "n_events",
            "total_value",
        )
    bounds = agg.agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    spine = (
        agg.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            F.explode(F.sequence(F.col("_mn"), F.col("_mx"))).alias("bucket"),
        )
    )
    return spine.join(agg, ["key", "bucket"], "left").select(
        F.col("key").alias(key_col),
        (F.col("bucket") * F.lit(int(bucket_seconds))).alias("bucket_start_s"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    kind_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: one row per step with the count of users whose
    event stream contains the steps in strict time order up to it (step
    k's event strictly AFTER the user's earliest completion of step k-1 —
    the earliest-completion greedy matching, which maximizes the count of
    users matched at every depth).

    Output: (step_idx, step_name, users_reached), step_idx 1-based,
    ordered by step_idx.
    """
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    staged = events.filter(F.col(kind_col).isin(list(steps))).select(
        F.col(user_col).alias("user"),
        F.col(kind_col).alias("kind"),
        _epoch_us(ts_col).alias("_us"),
    )
    # Chained per-user minima: step k's window condition references step
    # k-1's column, so each is a fresh projection over the SAME unordered
    # user partitioning — one Exchange, zero Sorts.
    from pyspark.sql import Window

    w = Window.partitionBy("user")
    cur = staged
    for i, step in enumerate(steps):
        prev_ok = F.lit(True) if i == 0 else (
            F.col(f"_s{i - 1}").isNotNull() & (F.col("_us") > F.col(f"_s{i - 1}"))
        )
        cur = cur.withColumn(
            f"_s{i}",
            F.min(
                F.when((F.col("kind") == F.lit(step)) & prev_ok, F.col("_us"))
            ).over(w),
        )
    per_user = cur.groupBy("user").agg(
        *[F.max(f"_s{i}").alias(f"_s{i}") for i in range(len(steps))]
    )
    flags = per_user.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step_idx"),
                        F.lit(step).alias("step_name"),
                        F.col(f"_s{i}").isNotNull().cast("int").alias("hit"),
                    )
                    for i, step in enumerate(steps)
                ]
            )
        ).alias("s")
    )
    return (
        flags.groupBy(
            F.col("s.step_idx").alias("step_idx"),
            F.col("s.step_name").alias("step_name"),
        )
        .agg(F.sum("s.hit").alias("users_reached"))
        .orderBy("step_idx")
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users cohorted by the epoch-week of
    their FIRST event; for every later week in which a cohort member is
    active, count distinct active users.

    Output: (cohort_week_start_s, week_offset, n_users) — offset 0 is the
    cohort's own week (n_users there is the cohort size, every user being
    active in their first week by construction).
    """
    staged = events.select(
        F.col(user_col).alias("user"),
        _epoch_us(ts_col).alias("_us"),
    )
    firsts = staged.groupBy("user").agg(
        (F.min("_us") - F.min("_us") % F.lit(_WEEK_US)).alias("_first_week_us")
    )
    joined = staged.join(firsts, "user").select(
        "user",
        "_first_week_us",
        (
            (F.col("_us") - F.col("_us") % F.lit(_WEEK_US) - F.col("_first_week_us"))
            / F.lit(_WEEK_US)
        ).cast("bigint").alias("week_offset"),
    )
    return (
        joined.groupBy("_first_week_us", "week_offset")
        .agg(F.count_distinct("user").alias("n_users"))
        .select(
            (F.col("_first_week_us") / F.lit(_US)).cast("bigint").alias(
                "cohort_week_start_s"
            ),
            "week_offset",
            "n_users",
        )
    )
