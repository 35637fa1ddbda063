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
