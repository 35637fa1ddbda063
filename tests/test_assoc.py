"""Association rules: hand-checked support/confidence/lift + plan shape."""

from __future__ import annotations

import pytest

from jsonschema_spark.operators.assoc import association_rules


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "user bigint, item string")


def test_rule_statistics(spark):
    # 4 users: {a,b}, {a,b}, {a}, {b,c}
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "b"), (4, "c")]
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(_baskets(spark, rows), "user", "item").collect()
    }
    ab = out[("a", "b")]
    assert ab["n_both"] == 2
    assert ab["support"] == pytest.approx(0.5, abs=2e-6)
    assert ab["confidence"] == pytest.approx(2 / 3, abs=2e-6)
    # lift = conf / P(b) = (2/3) / (3/4) = 8/9
    assert ab["lift"] == pytest.approx(8 / 9, abs=2e-6)
    ba = out[("b", "a")]
    assert ba["confidence"] == pytest.approx(2 / 3, abs=2e-6)
    assert ba["lift"] == pytest.approx(8 / 9, abs=2e-6)
    bc = out[("b", "c")]
    assert bc["confidence"] == pytest.approx(1 / 3, abs=2e-6)
    assert bc["lift"] == pytest.approx((1 / 3) / (1 / 4), abs=2e-6)
    assert ("a", "c") not in out  # never co-occur


def test_duplicate_events_do_not_inflate(spark):
    rows = [(1, "a"), (1, "a"), (1, "b")]  # repeated 'a' counts once
    out = association_rules(_baskets(spark, rows), "user", "item").collect()
    assert all(r["n_both"] == 1 for r in out)


def test_min_support_filters(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (3, "a"), (4, "a"), (2, "c"), (2, "b")]
    out = association_rules(
        _baskets(spark, rows), "user", "item", min_support=0.6
    ).collect()
    assert out == []  # max pair support here is 2/4 (threshold is >=)


def test_plan_reuses_entity_partitioning(spark):
    rows = [(1, "a"), (1, "b")]
    plan = (
        association_rules(_baskets(spark, rows), "user", "item")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan, plan
    # the pair self-join must broadcast-free co-locate on entity: no more
    # than the 2 distinct-side exchanges feeding one SortMergeJoin/shuffle
    # join, all small sides broadcast
    assert plan.count("BroadcastExchange") >= 3, plan
