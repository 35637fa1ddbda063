"""Known-answer tests for the chi-square / Jensen–Shannon / Wasserstein-1
drift checks (operators/drift.py): identical distributions score ~0, the
statistics match hand-computed values on tiny tables, and JS respects its
ln(2) bound under disjoint support (the case where PSI explodes)."""

from __future__ import annotations

import math

import pytest

from jsonschema_spark.operators.drift import chi2_statistic, js_divergence, wasserstein_1


def _cat_df(spark, rows):
    return spark.createDataFrame(rows, "cat string, g string")


def test_chi2_identical_distributions_is_zero(spark):
    rows = [("x", "a")] * 10 + [("y", "a")] * 5 + [("x", "b")] * 10 + [("y", "b")] * 5
    out = chi2_statistic(_cat_df(spark, rows), "cat", "g", "a", "b").collect()[0]
    assert out["chi2"] == pytest.approx(0.0, abs=1e-12)
    assert out["dof"] == 1


def test_chi2_hand_computed_on_spark(spark):
    # 2x2 table: a=(30 x, 10 y), b=(20 x, 20 y); N=80
    # expected counts: ex_a=25, ey_a=15, ex_b=25, ey_b=15
    # chi2 = 25/25 + 25/15 + 25/25 + 25/15 = 2 + 50/15
    rows = (
        [("x", "a")] * 30 + [("y", "a")] * 10 + [("x", "b")] * 20 + [("y", "b")] * 20
    )
    out = chi2_statistic(_cat_df(spark, rows), "cat", "g", "a", "b").collect()[0]
    assert out["chi2"] == pytest.approx(2 + 50 / 15, rel=1e-12)
    assert out["dof"] == 1


def test_js_identical_is_zero_and_disjoint_hits_ln2_bound(spark):
    same = [("x", "a")] * 7 + [("x", "b")] * 3
    out = js_divergence(_cat_df(spark, same), "cat", "g", "a", "b").collect()[0]
    assert out["js"] == pytest.approx(0.0, abs=1e-12)

    disjoint = [("x", "a")] * 5 + [("y", "b")] * 5
    out = js_divergence(_cat_df(spark, disjoint), "cat", "g", "a", "b").collect()[0]
    # eps-clipping keeps it a hair under ln 2, never above
    assert out["js"] == pytest.approx(math.log(2), rel=1e-3)
    assert out["js"] <= math.log(2) + 1e-12


def test_wasserstein_shift_equals_offset(spark):
    # b is a exactly +10: W1 of a pure shift is the shift (up to bucketing
    # granularity: bucket width (110-1)/1024 ≈ 0.106, so tolerance ~2 widths)
    rows = [(float(v), "a") for v in range(1, 101)] + [
        (float(v + 10), "b") for v in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "value double, g string")
    out = wasserstein_1(df, "value", "g", "a", "b").collect()[0]
    assert out["w1"] == pytest.approx(10.0, abs=0.3)


def test_wasserstein_identical_is_zero(spark):
    rows = [(float(v % 17), "a") for v in range(100)] + [
        (float(v % 17), "b") for v in range(100)
    ]
    df = spark.createDataFrame(rows, "value double, g string")
    out = wasserstein_1(df, "value", "g", "a", "b").collect()[0]
    assert out["w1"] == pytest.approx(0.0, abs=1e-12)


class TestEmbeddingCentroidDrift:
    def test_identical_cohorts_cosine_one_shifted_lower(self, spark):
        from jsonschema_spark.operators.drift import embedding_centroid_drift
        from pyspark.sql import functions as F

        rows = []
        for i in range(40):
            base = [1.0, 0.0, 0.5, 0.25]
            rows.append(("a", [v + (i % 3) * 0.01 for v in base]))
            rows.append(("b", [v + (i % 3) * 0.01 for v in base]))  # same dist
            rows.append(("c", [-v for v in base]))                   # opposite
        df = spark.createDataFrame(rows, "label string, embedding array<float>")
        out = {(r["cohort_a"], r["cohort_b"]): r["centroid_cosine"]
               for r in embedding_centroid_drift(df, "embedding", "label").collect()}
        assert out[("a", "b")] > 0.999999  # identical distributions
        assert out[("a", "c")] < -0.999    # flipped centroid
        assert len(out) == 3

    def test_shuffle_carries_only_cohort_dim_sums(self, spark):
        from jsonschema_spark.operators.drift import embedding_centroid_drift
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("a", [1.0, 2.0]), ("b", [3.0, 4.0])],
            "label string, embedding array<float>",
        )
        p = (
            embedding_centroid_drift(df, "embedding", "label")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "partial" in p.lower() or "HashAggregate" in p  # map-side combine


class TestDerivedColumnViolations:
    def test_nullsafe_and_multirule_single_pass(self, spark):
        from jsonschema_spark.operators.stats import derived_column_violations
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [
                ("d1", "abc", 3, 1),     # consistent
                ("d2", "abcd", 3, 1),    # stale n_chars
                ("d3", None, None, 1),   # null text, null count: consistent
                ("d4", "xy", None, 9),   # null stored vs 2: violation (+tok rule)
            ],
            "doc_id string, text string, n_chars int, n_toks int",
        )
        out = derived_column_violations(
            df,
            {
                "n_chars": F.length("text").cast("int"),
                "n_toks": F.when(
                    F.col("text").isNotNull(), F.size(F.split("text", " "))
                ).cast("int"),
            },
        )
        rows = {(r["doc_id"], r["column"]): (r["stored"], r["recomputed"])
                for r in out.collect()}
        assert rows[("d2", "n_chars")] == ("3", "4")
        assert rows[("d4", "n_chars")] == (None, "2")
        assert rows[("d4", "n_toks")] == ("9", "1")
        assert ("d1", "n_chars") not in rows and ("d3", "n_chars") not in rows
        p = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p and "ArrowEvalPython" not in p
