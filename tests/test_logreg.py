"""Distributed logistic regression (operators/logreg.fit_logreg):
learning direction on separable data, intercept-only behavior, and the
one-aggregation-per-round plan property."""

import math

from pyspark.sql import functions as F

from jsonschema_spark.operators.logreg import fit_logreg


def test_learns_separating_direction(spark):
    # y = 1 iff x > 0: weight on x must come out positive and grow the
    # margin; bias stays near 0 by symmetry
    rows = [(float(v), v > 0) for v in range(-50, 50) if v != 0]
    df = spark.createDataFrame(rows, "x double, y boolean")
    w = {r["feature"]: r["weight"] for r in fit_logreg(df, ["x"], "y", iterations=5, lr=0.5).collect()}
    assert w["x"] > 0.5
    assert abs(w["bias"]) < 0.1


def test_intercept_matches_base_rate_direction(spark):
    # all-positive labels with a useless feature: bias must go positive
    rows = [(1.0, True)] * 80 + [(1.0, False)] * 20
    df = spark.createDataFrame(rows, "x double, y boolean")
    w = {r["feature"]: r["weight"] for r in fit_logreg(df, ["x"], "y", iterations=4, lr=0.5).collect()}
    assert w["bias"] + w["x"] > 0  # net logit positive toward the 80% class


def test_deterministic_and_snapped(spark):
    rows = [(float(v % 7), v % 3 == 0) for v in range(200)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    a = sorted(map(tuple, fit_logreg(df, ["x"], "y").collect()))
    b = sorted(map(tuple, fit_logreg(df, ["x"], "y").collect()))
    assert a == b
    for _, wv in a:
        assert abs(wv * 1e6 - round(wv * 1e6)) < 1e-6  # on the 1e-6 grid


def test_gradient_step_matches_numpy_reference(spark):
    rows = [(0.5, True), (1.5, True), (-1.0, False), (-2.0, False)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    w = {r["feature"]: r["weight"] for r in fit_logreg(df, ["x"], "y", iterations=1, lr=0.5).collect()}
    # one step from w=0: p=0.5 for all rows; grad_b = mean(0.5-y),
    # grad_x = mean((0.5-y)*x)
    ys = [1, 1, 0, 0]
    xs = [0.5, 1.5, -1.0, -2.0]
    gb = sum(0.5 - y for y in ys) / 4
    gx = sum((0.5 - y) * x for x, y in zip(xs, ys)) / 4
    assert abs(w["bias"] - math.floor((-0.5 * gb) * 1e6 + 1e-6) / 1e6) < 1e-9
    assert abs(w["x"] - math.floor((-0.5 * gx) * 1e6 + 1e-6) / 1e6) < 1e-9
