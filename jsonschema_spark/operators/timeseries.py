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

__all__ = [
    "time_bucket_rollup",
    "funnel_steps",
    "retention_cohorts",
    "rolling_anomalies",
    "cusum_changepoints",
    "forecast_backtest",
    "trend_slope",
]

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
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel: one row per step with the count of users whose
    event stream contains the steps in strict time order up to it (step
    k's event strictly AFTER the user's earliest completion of step k-1 —
    the earliest-completion greedy matching, which maximizes the count of
    users matched at every depth when no window constrains the match).

    `within_seconds` adds the standard conversion-window constraint: step
    k must land in (prev, prev + within]. Matching stays
    earliest-completion greedy — with a window this is a heuristic (the
    classic funnel-product semantics), not a maximal matching, and the
    plan shape is unchanged.

    Output: (step_idx, step_name, users_reached), step_idx 1-based,
    ordered by step_idx.
    """
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    win_us = None if within_seconds is None else int(within_seconds) * _US
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
        if i == 0:
            prev_ok = F.lit(True)
        else:
            prev_ok = F.col(f"_s{i - 1}").isNotNull() & (
                F.col("_us") > F.col(f"_s{i - 1}")
            )
            if win_us is not None:
                prev_ok = prev_ok & (
                    F.col("_us") <= F.col(f"_s{i - 1}") + F.lit(win_us)
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


def rolling_anomalies(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 900,
    window: int = 8,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Trailing-window volume anomalies: per (key, bucket), z-score of the
    bucket's event count against the mean/std of the `window` PRECEDING
    buckets (current bucket excluded — the forecast frame never sees the
    point it judges). Emits only flagged buckets: |z| > z_thresh with at
    least 2 preceding buckets and nonzero variance.

    Gap-filled buckets participate as genuine zeros — a silent key IS the
    anomaly a volume monitor must catch, so the rolling frame must see the
    empty buckets (`time_bucket_rollup(gap_fill=True)` feeds this).

    Cross-engine float discipline: the frame aggregates are an exact-int
    `sum` / `sum of squares` / `count` over bigint counts (no engine-order
    float drift — windowed double sums disagree between engines because
    segment-tree vs running summation reorders the adds); mean and the
    sample variance ``(sumsq - sum²/n)/(n-1)`` are then derived by one
    shared expression tree. The z-score is grid-snapped (nudge-then-floor).

    Scale shape: one full-data exchange (the rollup groupBy); the window
    runs over the gap-filled spine — #keys × #buckets rows, independent of
    raw event count — partitioned by key.
    """
    from pyspark.sql import Window

    roll = time_bucket_rollup(
        events,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        bucket_seconds=bucket_seconds,
        gap_fill=True,
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start_s")
        .rowsBetween(-int(window), -1)
    )
    n = F.col("n_events").cast("bigint")
    staged = roll.select(
        F.col(key_col),
        "bucket_start_s",
        "n_events",
        F.count(F.lit(1)).over(w).alias("_w_n"),
        F.sum(n).over(w).alias("_w_sum"),
        F.sum(n * n).over(w).alias("_w_sumsq"),
    )
    wn = F.col("_w_n").cast("double")
    mean = F.col("_w_sum").cast("double") / wn
    var = (
        F.col("_w_sumsq").cast("double")
        - F.col("_w_sum").cast("double") * F.col("_w_sum").cast("double") / wn
    ) / (wn - F.lit(1.0))
    z = (F.col("n_events").cast("double") - mean) / F.sqrt(var)
    return (
        staged.filter(F.col("_w_n") >= 2)
        .select(
            F.col(key_col),
            "bucket_start_s",
            "n_events",
            (F.floor(mean * 1e6 + F.lit(1e-6)) / 1e6).alias("window_mean"),
            F.when(var > 0, F.floor(z * 1e6 + F.lit(1e-6)) / 1e6).alias("z"),
        )
        .filter(F.col("z").isNotNull() & (F.abs("z") > F.lit(float(z_thresh))))
    )


def cusum_changepoints(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 900,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM level-shift detection on per-bucket event counts:
    per key, fold the gap-filled bucket series in time order through
    ``s⁺ₜ = max(0, s⁺ₜ₋₁ + (xₜ - μ - kσ̂))`` (and the mirrored s⁻), where μ
    is the key's own series mean, σ̂ its population std, k the `slack` and
    the alarm fires when s⁺ or s⁻ exceeds ``threshold · σ̂``. Emits one row
    per alarm bucket: (key, bucket_start_s, n_events, cusum_pos, cusum_neg,
    direction).

    The recursion is inherently sequential per key, but the series length
    is #buckets (time range / bucket width) — independent of raw row count
    — so each key's fold is a bounded-size JVM higher-order ``aggregate``
    over its collected (bucket, count) array, sorted in-array (array_sort
    on struct order = bucket order; no window Sort). One exchange for the
    rollup, one key-level groupBy that reuses nothing bigger than the
    spine. μ, σ̂ derive from exact-int sums; the fold's doubles follow one
    left-to-right expression order in both engines (oracle: recursive CTE).
    """
    roll = time_bucket_rollup(
        events,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        bucket_seconds=bucket_seconds,
        gap_fill=True,
    )
    series = roll.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("bucket_start_s").alias("b"),
                    F.col("n_events").cast("bigint").alias("n"),
                )
            )
        ).alias("_ser"),
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col("n_events").cast("bigint")).alias("_sum"),
        F.sum(
            F.col("n_events").cast("bigint") * F.col("n_events").cast("bigint")
        ).alias("_sumsq"),
    )
    cnt = F.col("_cnt").cast("double")
    mu = F.col("_sum").cast("double") / cnt
    sigma = F.sqrt(
        F.greatest(
            F.lit(0.0),
            F.col("_sumsq").cast("double") / cnt - mu * mu,
        )
    )
    k = F.lit(float(slack)) * sigma
    h = F.lit(float(threshold)) * sigma
    # Fold carries (s_pos, s_neg, alarms[]) — alarms keep the bucket plus
    # both statistics at the alarm instant.
    fold = F.aggregate(
        F.col("_ser"),
        F.struct(
            F.lit(0.0).alias("sp"),
            F.lit(0.0).alias("sn"),
            F.expr(
                "CAST(array() AS array<struct<b:bigint,n:bigint,"
                "sp:double,sn:double>>)"
            ).alias("out"),
        ),
        lambda acc, x: F.struct(
            F.greatest(
                F.lit(0.0), acc["sp"] + (x["n"].cast("double") - mu - k)
            ).alias("sp"),
            F.greatest(
                F.lit(0.0), acc["sn"] + (mu - x["n"].cast("double") - k)
            ).alias("sn"),
            F.when(
                (
                    F.greatest(
                        F.lit(0.0), acc["sp"] + (x["n"].cast("double") - mu - k)
                    )
                    > h
                )
                | (
                    F.greatest(
                        F.lit(0.0), acc["sn"] + (mu - x["n"].cast("double") - k)
                    )
                    > h
                ),
                F.array_append(
                    acc["out"],
                    F.struct(
                        x["b"].alias("b"),
                        x["n"].alias("n"),
                        F.greatest(
                            F.lit(0.0),
                            acc["sp"] + (x["n"].cast("double") - mu - k),
                        ).alias("sp"),
                        F.greatest(
                            F.lit(0.0),
                            acc["sn"] + (mu - x["n"].cast("double") - k),
                        ).alias("sn"),
                    ),
                ),
            )
            .otherwise(acc["out"])
            .alias("out"),
        ),
    )
    exploded = series.filter(sigma > 0).select(
        F.col(key_col), F.explode(fold["out"]).alias("a")
    )
    return exploded.select(
        F.col(key_col),
        F.col("a.b").alias("bucket_start_s"),
        F.col("a.n").alias("n_events"),
        (F.floor(F.col("a.sp") * 1e6 + F.lit(1e-6)) / 1e6).alias("cusum_pos"),
        (F.floor(F.col("a.sn") * 1e6 + F.lit(1e-6)) / 1e6).alias("cusum_neg"),
        F.when(F.col("a.sp") >= F.col("a.sn"), F.lit("up"))
        .otherwise(F.lit("down"))
        .alias("direction"),
    )


def forecast_backtest(
    daily: DataFrame,
    *,
    key_col: str,
    day_col: str,
    value_col: str,
    window: int = 8,
    decay: float = 0.75,
    season: int = 7,
) -> DataFrame:
    """One-step-ahead forecast backtest per key over a daily series: EWMA
    (trailing `window` points, geometric weights `decay^i`) vs the
    seasonal-naive baseline (value `season` rows back). Returns
    (key, n_days, n_scored, mape_snaive, mape_ewma) — the standard "is a
    smoother beating the dumb baseline" telemetry health check, and the
    forecasting complement to `rolling_anomalies` (which scores the
    CURRENT point against its trailing stats rather than predicting the
    next).

    Exactness contract: the EWMA numerator/denominator are CHAINED lag
    terms — `w0·lag(x,1) + w1·lag(x,2) + …` with the weights emitted as
    exact literals (powers of 3/4 are finite binary fractions) — so both
    Spark and any SQL oracle evaluate the same left-associated float sum
    bit-for-bit; no array fold whose reduction order an engine could pick
    differently. Missing leading points drop out of numerator AND
    denominator (partial-window EWMA, standard).

    Scale shape: ONE hash exchange on the key; every lag shares the
    (key, day) sort. The input is the already-rolled-up daily relation
    (keys × days), not raw events — metadata scale. Rows with a NULL or
    zero actual are excluded from MAPE (division guard) but still feed
    the lag windows."""
    from pyspark.sql import Window

    assert 1 <= window <= 30
    w = Window.partitionBy(key_col).orderBy(day_col)
    x = F.col(value_col)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i in range(1, window + 1):
        wt = decay ** (i - 1)
        li = F.lag(x, i).over(w)
        num = num + F.when(li.isNotNull(), li * F.lit(wt)).otherwise(F.lit(0.0))
        den = den + F.when(li.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    ewma = F.when(den > 0, num / den)
    snaive = F.lag(x, season).over(w)
    scored = daily.select(
        F.col(key_col).alias("key"),
        x.alias("actual"),
        ewma.alias("f_ewma"),
        snaive.alias("f_snaive"),
    )
    ok = (
        F.col("actual").isNotNull()
        & (F.col("actual") != 0)
        & F.col("f_ewma").isNotNull()
        & F.col("f_snaive").isNotNull()
    )
    ape = lambda f: F.abs(F.col("actual") - F.col(f)) / F.abs(F.col("actual"))  # noqa: E731
    snap = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)  # noqa: E731
    return scored.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(ok.cast("bigint")).alias("n_scored"),
        snap(F.avg(F.when(ok, ape("f_snaive")))).alias("mape_snaive"),
        snap(F.avg(F.when(ok, ape("f_ewma")))).alias("mape_ewma"),
    )


def trend_slope(
    daily: DataFrame,
    *,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key OLS trend over a (x, y) series — closed-form slope /
    intercept / r² from the five sufficient sums (n, Σx, Σy, Σxy, Σx²,
    Σy²) in ONE map-side-combining aggregation: the "is this metric
    drifting over time" detector that complements `cusum_changepoints`
    (level SHIFTS) with a monotone-trend readout. Formulas are evaluated
    in a fixed operand order (n·Σxy − Σx·Σy over n·Σx² − Σx², textbook
    form) so any SQL engine reproduces them to float precision; the
    caller supplies integer x (e.g. day index) for exact sums. Returns
    (key, n, slope, intercept, r2), snapped; keys with a degenerate x
    variance (n < 2 or all-equal x) emit NULL slope/intercept/r2."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = daily.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(dx > 0, cov / dx)
    intercept = F.when(dx > 0, (F.col("sy") - cov / dx * F.col("sx")) / n)
    r2 = F.when((dx > 0) & (dy > 0), cov * cov / (dx * dy))
    snap = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)  # noqa: E731
    return agg.select(
        "key",
        "n",
        snap(slope).alias("slope"),
        snap(intercept).alias("intercept"),
        snap(r2).alias("r2"),
    )
