"""Time-bucket rollup, funnel, retention: semantics and plan shape."""

from __future__ import annotations

from datetime import datetime, timedelta

from jsonschema_spark.operators.timeseries import (
    funnel_steps,
    retention_cohorts,
    time_bucket_rollup,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)
WEEK = timedelta(days=7)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double",
    )


def test_rollup_gap_fill_emits_empty_buckets(spark):
    # key 'a' has events in buckets 0 and 2; bucket 1 must appear with 0/0.0
    rows = [
        (1, T0, 1, "a", 1.5),
        (2, T0 + timedelta(seconds=10), 1, "a", 2.0),
        (3, T0 + timedelta(seconds=125), 1, "a", 4.0),
        (4, T0 + timedelta(seconds=61), 1, "b", 8.0),
    ]
    out = time_bucket_rollup(_events(spark, rows), bucket_seconds=60)
    got = {
        (r["event_type"], r["bucket_start_s"]): (r["n_events"], r["total_value"])
        for r in out.collect()
    }
    base = int(T0.timestamp()) if False else 1704067200
    assert got == {
        ("a", base): (2, 3.5),
        ("a", base + 60): (0, 0.0),
        ("a", base + 120): (1, 4.0),
        ("b", base): (0, 0.0),
        ("b", base + 60): (1, 8.0),
        ("b", base + 120): (0, 0.0),
    }


def test_rollup_no_gap_fill_skips_empty(spark):
    rows = [(1, T0, 1, "a", 1.0), (2, T0 + timedelta(seconds=125), 1, "a", 2.0)]
    out = time_bucket_rollup(_events(spark, rows), bucket_seconds=60, gap_fill=False)
    assert out.count() == 2


def test_funnel_requires_strict_order(spark):
    # user 1 completes view->click->purchase in order; user 2 has the click
    # BEFORE its view (only depth 1); user 3 view+click same instant (strictly
    # after fails -> depth 1); user 4 reaches depth 2.
    s = timedelta(seconds=1)
    rows = [
        (1, T0, 1, "view", 0.0),
        (2, T0 + s, 1, "click", 0.0),
        (3, T0 + 2 * s, 1, "purchase", 0.0),
        (4, T0, 2, "click", 0.0),
        (5, T0 + s, 2, "view", 0.0),
        (6, T0, 3, "view", 0.0),
        (7, T0, 3, "click", 0.0),
        (8, T0, 4, "view", 0.0),
        (9, T0 + s, 4, "click", 0.0),
    ]
    out = funnel_steps(_events(spark, rows), ["view", "click", "purchase"])
    got = {r["step_idx"]: (r["step_name"], r["users_reached"]) for r in out.collect()}
    assert got == {1: ("view", 4), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_earliest_completion_matching(spark):
    # click before the first view does not count, but a later one does.
    s = timedelta(seconds=1)
    rows = [
        (1, T0, 1, "click", 0.0),
        (2, T0 + s, 1, "view", 0.0),
        (3, T0 + 2 * s, 1, "click", 0.0),
    ]
    out = funnel_steps(_events(spark, rows), ["view", "click"])
    got = {r["step_idx"]: r["users_reached"] for r in out.collect()}
    assert got == {1: 1, 2: 1}


def test_retention_offsets_and_cohort_size(spark):
    # user 1 first-touch week 0, active weeks 0 and 2; user 2 first-touch
    # week 2, active week 2 only. Epoch weeks: T0 is a Monday boundary? Not
    # needed — offsets are relative to each user's own first week.
    rows = [
        (1, T0, 1, "view", 0.0),
        (2, T0 + 2 * WEEK + timedelta(hours=5), 1, "view", 0.0),
        (3, T0 + 2 * WEEK, 2, "view", 0.0),
    ]
    out = retention_cohorts(_events(spark, rows))
    got = {
        (r["cohort_week_start_s"], r["week_offset"]): r["n_users"]
        for r in out.collect()
    }
    weeks = {c for (c, _o) in got}
    assert len(weeks) == 2
    c1, c2 = sorted(weeks)
    assert c2 - c1 == 2 * 7 * 86400
    assert got == {(c1, 0): 1, (c1, 2): 1, (c2, 0): 1}


def test_plan_shapes(spark):
    rows = [(1, T0, 1, "view", 1.0), (2, T0 + timedelta(seconds=1), 1, "click", 2.0)]
    df = _events(spark, rows)
    # funnel: the chained windows + per-user groupBy share ONE exchange;
    # the 3-row summary adds its own tiny exchange. No Sort for the
    # unordered windows, no Python anywhere.
    plan = (
        funnel_steps(df, ["view", "click"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user") == 1, plan
    # rollup: full-data exchange only for the groupBy; spine joins broadcast.
    plan = (
        time_bucket_rollup(df, bucket_seconds=60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    plan = retention_cohorts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


def test_rolling_anomalies_flags_spike(spark):
    from jsonschema_spark.operators.timeseries import rolling_anomalies

    # steady 2 events/bucket with tiny jitter, then a 40-event spike
    rows = []
    eid = 0
    for b in range(10):
        n = 2 if b % 2 == 0 else 3
        if b == 9:
            n = 40
        for j in range(n):
            eid += 1
            rows.append((eid, T0 + timedelta(seconds=60 * b + j), 1, "a", 1.0))
    out = rolling_anomalies(
        _events(spark, rows), bucket_seconds=60, window=8, z_thresh=3.0
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["event_type"] == "a" and r["n_events"] == 40 and r["z"] > 3.0


def test_rolling_anomalies_silent_key_is_anomalous(spark):
    from jsonschema_spark.operators.timeseries import rolling_anomalies

    # key 'a' emits 5/bucket for 9 buckets then goes silent while key 'b'
    # keeps the global range alive — the gap-filled zero must flag (z < -3).
    rows = []
    eid = 0
    for b in range(10):
        for j in range(5 if b < 9 else 0):
            eid += 1
            rows.append((eid, T0 + timedelta(seconds=60 * b + j), 1, "a", 1.0))
        eid += 1
        rows.append((eid, T0 + timedelta(seconds=60 * b), 2, "b", 1.0))
    # jitter so the window variance is nonzero
    eid += 1
    rows.append((eid, T0 + timedelta(seconds=61), 3, "a", 1.0))
    out = rolling_anomalies(
        _events(spark, rows), bucket_seconds=60, window=8, z_thresh=3.0
    ).collect()
    flagged = {(r["event_type"], r["n_events"]) for r in out}
    assert ("a", 0) in flagged
    assert all(r["z"] < -3.0 for r in out if r["event_type"] == "a")


def test_cusum_detects_level_shift(spark):
    from jsonschema_spark.operators.timeseries import cusum_changepoints

    # 12 buckets at ~3/bucket, then 8 buckets at ~9/bucket: the CUSUM s+
    # accumulates after the shift and must alarm in the second regime only.
    rows = []
    eid = 0
    for b in range(20):
        n = 3 if b < 12 else 9
        if b % 3 == 0:
            n += 1
        for j in range(n):
            eid += 1
            rows.append((eid, T0 + timedelta(seconds=60 * b + j), 1, "a", 1.0))
    out = cusum_changepoints(
        _events(spark, rows), bucket_seconds=60, slack=0.5, threshold=3.0
    ).collect()
    assert out, "expected at least one alarm"
    base = 1704067200
    ups = [r for r in out if r["direction"] == "up"]
    # the level shift must raise 'up' alarms, all strictly inside the
    # second regime; 'down' alarms in the low regime are legitimate
    # two-sided behavior (the reference mean is the whole-series mean)
    assert ups
    assert all(r["bucket_start_s"] >= base + 12 * 60 for r in ups)
    assert all(
        r["bucket_start_s"] < base + 12 * 60
        for r in out
        if r["direction"] == "down"
    )


def test_cusum_quiet_series_no_alarm(spark):
    from jsonschema_spark.operators.timeseries import cusum_changepoints

    rows = []
    eid = 0
    for b in range(16):
        for j in range(3 if b % 2 == 0 else 4):
            eid += 1
            rows.append((eid, T0 + timedelta(seconds=60 * b + j), 1, "a", 1.0))
    out = cusum_changepoints(
        _events(spark, rows), bucket_seconds=60, slack=0.5, threshold=5.0
    ).collect()
    assert out == []


def test_anomaly_cusum_plans_are_python_free(spark):
    from jsonschema_spark.operators.timeseries import (
        cusum_changepoints,
        rolling_anomalies,
    )

    rows = [(1, T0, 1, "a", 1.0), (2, T0 + timedelta(seconds=61), 1, "a", 1.0)]
    df = _events(spark, rows)
    for op in (rolling_anomalies, cusum_changepoints):
        plan = op(df, bucket_seconds=60)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, plan


def test_funnel_conversion_window(spark):
    from jsonschema_spark.operators.timeseries import funnel_steps

    s = timedelta(seconds=1)
    rows = [
        # user 1 converts within 10s at each hop
        (1, T0, 1, "view", 0.0),
        (2, T0 + 5 * s, 1, "click", 0.0),
        # user 2's click comes 100s after the view: outside the window
        (3, T0, 2, "view", 0.0),
        (4, T0 + 100 * s, 2, "click", 0.0),
        # user 3: a too-late click, then none in window
        (5, T0, 3, "view", 0.0),
        (6, T0 + 11 * s, 3, "click", 0.0),
    ]
    out = funnel_steps(
        _events(spark, rows), ["view", "click"], within_seconds=10
    )
    got = {r["step_idx"]: r["users_reached"] for r in out.collect()}
    assert got == {1: 3, 2: 1}
    # boundary: exactly `within` seconds later still counts (closed right edge)
    rows_b = [(1, T0, 1, "view", 0.0), (2, T0 + 10 * s, 1, "click", 0.0)]
    got_b = {
        r["step_idx"]: r["users_reached"]
        for r in funnel_steps(
            _events(spark, rows_b), ["view", "click"], within_seconds=10
        ).collect()
    }
    assert got_b == {1: 1, 2: 1}
