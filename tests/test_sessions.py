"""Sessionization + as-of attribution: boundary semantics and plan shape."""

from __future__ import annotations

from datetime import datetime, timedelta

from jsonschema_spark.operators.sessions import asof_attribute, sessionize

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double"
    )


def test_gap_boundary_is_strictly_greater(spark):
    # second event exactly gap_seconds later -> same session;
    # third event gap_seconds + 1us later -> new session.
    gap = 60
    rows = [
        (1, T0, 7, "view", 1.0),
        (2, T0 + timedelta(seconds=gap), 7, "view", 2.0),
        (3, T0 + timedelta(seconds=2 * gap, microseconds=1), 7, "view", 4.0),
    ]
    out = sessionize(_events(spark, rows), gap_seconds=gap, value_col="value")
    got = {r["session_seq"]: (r["n_events"], r["total_value"]) for r in out.collect()}
    assert got == {1: (2, 3.0), 2: (1, 4.0)}


def test_sessions_are_per_user_and_deterministic_on_ties(spark):
    rows = [
        (10, T0, 1, "view", 1.0),
        (11, T0, 2, "view", 1.0),  # same ts, different user: separate sessions
        (12, T0, 1, "view", 1.0),  # same user, same ts: tie broken by event_id
    ]
    out = sessionize(_events(spark, rows), gap_seconds=60)
    rows_out = {(r["user_id"], r["session_seq"]): r["n_events"] for r in out.collect()}
    assert rows_out == {(1, 1): 2, (2, 1): 1}


def test_asof_attributes_latest_prior_view(spark):
    rows = [
        (1, T0, 5, "view", 0.0),
        (2, T0 + timedelta(seconds=10), 5, "view", 0.0),
        (3, T0 + timedelta(seconds=20), 5, "click", 0.0),
        (4, T0 + timedelta(seconds=30), 5, "click", 0.0),  # still view 2
        (5, T0 + timedelta(seconds=40), 5, "error", 0.0),  # other kinds ignored
    ]
    out = {r["left_id"]: (r["right_id"], r["gap_us"]) for r in
           asof_attribute(_events(spark, rows)).collect()}
    assert out == {3: (2, 10_000_000), 4: (2, 20_000_000)}


def test_asof_tie_counts_as_at_or_before_and_no_prior_is_null(spark):
    rows = [
        (1, T0, 5, "click", 0.0),                         # no prior view -> NULLs
        (2, T0 + timedelta(seconds=5), 5, "view", 0.0),
        (3, T0 + timedelta(seconds=5), 5, "click", 0.0),  # same instant: view wins
    ]
    out = {r["left_id"]: (r["right_id"], r["gap_us"]) for r in
           asof_attribute(_events(spark, rows)).collect()}
    assert out == {1: (None, None), 3: (2, 0)}


def test_both_plans_single_exchange_no_python(spark):
    rows = [(1, T0, 5, "view", 0.0), (2, T0 + timedelta(seconds=1), 5, "click", 0.0)]
    df = _events(spark, rows)
    for out in (sessionize(df, value_col="value"), asof_attribute(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "Python" not in plan, plan
