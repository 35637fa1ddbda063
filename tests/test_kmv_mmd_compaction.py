"""Session-9 operators: KMV bottom-k sketch laws, polynomial-kernel MMD
drift, and the compaction bin-packing planner."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.drift import embedding_mmd_drift
from jsonschema_spark.operators.layout import compaction_plan
from jsonschema_spark.operators.sketches import kmv_build, kmv_estimate, kmv_merge


# ------------------------------------------------------------------ KMV

def _brute_bottom_k(terms, k):
    hs = sorted(
        hashlib.md5(f"kmv:{t}".encode()).hexdigest() for t in set(terms)
    )
    return hs[:k]


def test_kmv_build_matches_brute_force_bottom_k(spark):
    # heavy duplication: 20k rows, 1.1k distinct — the row-count-based
    # threshold would undershoot here; the approx_count_distinct one must not
    terms = [f"u{i % 1100}" for i in range(20000)]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    sk = kmv_build(df, "term", k=32).orderBy("rk").collect()
    assert [r["hx"] for r in sk] == _brute_bottom_k(terms, 32)
    assert [r["rk"] for r in sk] == list(range(1, 33))


def test_kmv_small_domain_is_exact(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(10)], "term string")
    sk = kmv_build(df, "term", k=32)
    est = kmv_estimate(sk, k=32).collect()[0]
    assert est["n_sketch"] == 10
    assert est["est"] == 10  # sketch holds the whole domain -> exact


def test_kmv_merge_equals_direct_build(spark):
    rows = [(f"d{i % 3}", f"u{i % 400}") for i in range(5000)]
    df = spark.createDataFrame(rows, "day string, term string")
    per_day = kmv_build(df, "term", k=16, group_cols=("day",))
    merged = kmv_merge(
        per_day.withColumn("day", F.lit("ALL")), k=16, group_cols=("day",)
    )
    direct = kmv_build(
        df.withColumn("day", F.lit("ALL")), "term", k=16, group_cols=("day",)
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_kmv_estimate_error_bound(spark):
    n = 5000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "term string")
    est = kmv_estimate(kmv_build(df, "term", k=256), k=256).collect()[0]
    # relative error ~1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est["est"] - n) / n < 0.25


# ------------------------------------------------------------------ MMD

def _mmd_numpy(groups):
    cs = {
        c: (np.asarray(x, dtype=np.float64).T @ np.asarray(x, dtype=np.float64))
        / len(x)
        for c, x in groups.items()
    }
    out = {}
    for a in sorted(cs):
        for b in sorted(cs):
            if a < b:
                out[(a, b)] = float(((cs[a] - cs[b]) ** 2).sum())
    return out


@pytest.fixture(scope="module")
def mmd_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    for c in range(3):
        # same mean (zero), different covariance scale per cohort
        x = rng.normal(0.0, 1.0 + 0.5 * c, size=(40, 8))
        rows += [(c, [float(v) for v in r]) for r in x]
    return spark.createDataFrame(rows, "label int, embedding array<double>")


def test_mmd_matches_numpy(spark, mmd_df):
    groups = {}
    for r in mmd_df.collect():
        groups.setdefault(r["label"], []).append(r["embedding"])
    expect = _mmd_numpy(groups)
    got = {
        (r["cohort_a"], r["cohort_b"]): r["mmd2"]
        for r in embedding_mmd_drift(mmd_df, "embedding", "label").collect()
    }
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=2e-6)


def test_mmd_arrow_path_parity(spark, mmd_df):
    col = embedding_mmd_drift(mmd_df, "embedding", "label", method="column")
    arw = embedding_mmd_drift(mmd_df, "embedding", "label", method="arrow")
    assert sorted(map(tuple, col.collect())) == sorted(map(tuple, arw.collect()))


def test_mmd_sees_covariance_shift_centroid_misses(spark, mmd_df):
    # cohorts share a zero mean: MMD (2nd moment) must separate them
    rows = embedding_mmd_drift(mmd_df, "embedding", "label").collect()
    assert all(r["mmd2"] > 0.1 for r in rows)


def test_mmd_identical_cohorts_is_zero(spark):
    base = [[float(i + j) for j in range(4)] for i in range(20)]
    rows = [(c, v) for c in (0, 1) for v in base]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    out = embedding_mmd_drift(df, "embedding", "label").collect()
    assert len(out) == 1 and out[0]["mmd2"] == 0.0


# ----------------------------------------------------------- compaction

@pytest.fixture(scope="module")
def manifest_df(spark):
    rows = []
    for p in ("a", "b"):
        for i in range(20):
            rows.append((p, i, 100 + 37 * ((i * 7) % 13)))
    rows.append(("a", 99, 5000))  # oversized file
    return spark.createDataFrame(rows, "part string, file_id int, sz long")


def test_compaction_conserves_files_and_bytes(spark, manifest_df):
    plan = compaction_plan(
        manifest_df, partition_col="part", file_col="file_id",
        size_col="sz", target_bytes=1000,
    )
    tot = plan.agg(F.sum("n_files"), F.sum("total_bytes")).collect()[0]
    src = manifest_df.agg(F.count("*"), F.sum("sz")).collect()[0]
    assert (tot[0], tot[1]) == (src[0], src[1])


def test_compaction_bins_are_bounded(spark, manifest_df):
    target = 1000
    plan = compaction_plan(
        manifest_df, partition_col="part", file_col="file_id",
        size_col="sz", target_bytes=target,
    ).collect()
    max_sz = 5000
    for r in plan:
        # next-fit bound: a bin never exceeds target + one max-size file
        assert r["total_bytes"] <= target + max_sz
    # the oversized file sits alone in its bin
    solo = [r for r in plan if r["total_bytes"] >= 5000]
    assert any(r["n_files"] == 1 for r in solo)


def test_compaction_matches_reference_assignment(spark, manifest_df):
    target = 1000
    plan = {
        (r["partition"], r["bin"]): (r["n_files"], r["total_bytes"])
        for r in compaction_plan(
            manifest_df, partition_col="part", file_col="file_id",
            size_col="sz", target_bytes=target,
        ).collect()
    }
    expect: dict = {}
    rows = manifest_df.collect()
    for p in {r["part"] for r in rows}:
        cum = 0
        for r in sorted(
            (r for r in rows if r["part"] == p),
            key=lambda r: (-r["sz"], r["file_id"]),
        ):
            b = cum // target
            n, t = expect.get((p, b), (0, 0))
            expect[(p, b)] = (n + 1, t + r["sz"])
            cum += r["sz"]
    assert plan == expect


# ------------------------------------------------------------------ CDC

def _cdc(spark, base_rows, change_rows):
    from jsonschema_spark.operators.cdc import apply_cdc_batch

    base = spark.createDataFrame(base_rows, "k long, v string")
    ch = spark.createDataFrame(change_rows, "op string, k long, v string")
    out = apply_cdc_batch(base, ch, key_col="k").collect()
    return {r["k"]: (r["v"], r["_action"]) for r in out}


def test_cdc_merge_semantics(spark):
    got = _cdc(
        spark,
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")],
        [("D", 2, None), ("U", 3, "c2"), ("I", 9, "z")],
    )
    assert got == {
        1: ("a", "kept"),
        3: ("c2", "updated"),
        4: ("d", "kept"),
        9: ("z", "inserted"),
    }


def test_cdc_strict_ops_are_noops_when_unmatched(spark):
    # U on a missing key and I on an existing key must not apply
    got = _cdc(
        spark,
        [(1, "a")],
        [("U", 5, "ghost"), ("I", 1, "dupe")],
    )
    assert got == {1: ("a", "kept")}


def test_cdc_delete_wins_over_update_on_same_key(spark):
    got = _cdc(
        spark,
        [(1, "a"), (2, "b")],
        [("D", 1, None), ("U", 1, "revived")],
    )
    assert got == {2: ("b", "kept")}


def test_cdc_conserves_untouched_rows(spark):
    base = [(i, f"v{i}") for i in range(50)]
    got = _cdc(spark, base, [("D", 7, None), ("U", 11, "x"), ("I", 99, "y")])
    assert len(got) == 50  # 50 - 1 deleted + 1 inserted
    kept = [k for k, (_, a) in got.items() if a == "kept"]
    assert len(kept) == 48


# ------------------------------------------------------------- forecast

def _backtest(spark, series, **kw):
    from jsonschema_spark.operators.timeseries import forecast_backtest

    rows = [("k", f"d{i:03d}", float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "k string, day string, v double")
    return forecast_backtest(df, key_col="k", day_col="day", value_col="v", **kw)


def _ewma_ref(series, t, window=8, decay=0.75):
    num = den = 0.0
    for i in range(1, window + 1):
        j = t - i
        if j >= 0:
            num += series[j] * decay ** (i - 1)
            den += decay ** (i - 1)
    return num / den if den > 0 else None


def test_forecast_matches_python_reference(spark):
    series = [10, 12, 11, 15, 14, 13, 16, 18, 17, 19, 20, 22, 21, 23]
    out = _backtest(spark, series).collect()[0]
    n = len(series)
    apes_e, apes_s = [], []
    for t in range(n):
        f_e = _ewma_ref(series, t)
        f_s = series[t - 7] if t >= 7 else None
        if f_e is not None and f_s is not None and series[t] != 0:
            apes_e.append(abs(series[t] - f_e) / abs(series[t]))
            apes_s.append(abs(series[t] - f_s) / abs(series[t]))
    assert out["n_days"] == n
    assert out["n_scored"] == len(apes_e)
    assert out["mape_ewma"] == pytest.approx(sum(apes_e) / len(apes_e), abs=2e-6)
    assert out["mape_snaive"] == pytest.approx(sum(apes_s) / len(apes_s), abs=2e-6)


def test_forecast_short_series_scores_nothing(spark):
    out = _backtest(spark, [5.0, 6.0, 7.0]).collect()[0]
    # no point has both a lag-7 baseline and an actual -> MAPE undefined
    assert out["n_scored"] == 0
    assert out["mape_ewma"] is None and out["mape_snaive"] is None


def test_forecast_ewma_beats_snaive_on_trend(spark):
    # steadily trending series: lag-7 is stale, EWMA tracks
    series = [100 + 5 * i for i in range(30)]
    out = _backtest(spark, series).collect()[0]
    assert out["mape_ewma"] < out["mape_snaive"]


# ------------------------------------------------------------ zone maps

@pytest.fixture(scope="module")
def zm_rows(spark):
    rows = []
    for f in range(6):
        for i in range(30):
            v = f * 100 + i  # layout-correlated column
            u = (i * 17) % 30  # uncorrelated column
            rows.append((f, float(v), float(u) if i % 9 else None))
    return spark.createDataFrame(rows, "file int, v double, u double")


def test_zone_maps_match_brute_force(spark, zm_rows):
    from jsonschema_spark.operators.layout import zone_map_stats

    zm = {
        (r["file"], r["column"]): (r["vmin"], r["vmax"], r["n_rows"], r["n_null"])
        for r in zone_map_stats(zm_rows, file_col="file", value_cols=["v", "u"]).collect()
    }
    data = zm_rows.collect()
    for f in range(6):
        for c in ("v", "u"):
            vals = [r[c] for r in data if r["file"] == f]
            nn = [x for x in vals if x is not None]
            assert zm[(f, c)] == (min(nn), max(nn), len(vals), len(vals) - len(nn))


def test_prune_audit_never_prunes_a_matching_row(spark, zm_rows):
    from jsonschema_spark.operators.layout import zone_map_prune_audit, zone_map_stats

    zm = zone_map_stats(zm_rows, file_col="file", value_cols=["v", "u"])
    preds = [("v", 150, 250), ("u", 5, 10)]
    audit = {r["column"]: r for r in zone_map_prune_audit(zm, preds).collect()}
    # soundness: rows matching the predicate never live in a pruned file
    data = zm_rows.collect()
    for col, lo, hi in preds:
        pruned_rows = audit[col]["rows_pruned"]
        total_rows = sum(1 for r in data if r["file"] is not None)
        matching = [r for r in data if r[col] is not None and lo <= r[col] <= hi]
        # every matching row is in a survivor file
        assert total_rows - pruned_rows >= len(matching)
    # the layout-correlated column prunes most files; uncorrelated prunes none
    assert audit["v"]["files_pruned"] >= 4
    assert audit["u"]["files_pruned"] == 0


def test_zone_maps_merge_to_table_grain(spark, zm_rows):
    from jsonschema_spark.operators.layout import zone_map_stats

    per_file = zone_map_stats(zm_rows, file_col="file", value_cols=["v"])
    table = per_file.groupBy("column").agg(
        F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax"),
        F.sum("n_rows").alias("n_rows"), F.sum("n_null").alias("n_null"),
    ).collect()[0]
    direct = zone_map_stats(
        zm_rows.withColumn("file", F.lit(0)), file_col="file", value_cols=["v"]
    ).collect()[0]
    assert (table["vmin"], table["vmax"], table["n_rows"], table["n_null"]) == (
        direct["vmin"], direct["vmax"], direct["n_rows"], direct["n_null"]
    )


# --------------------------------------------------- FD / Benford profile

def test_fd_violations_exact_repairs(spark):
    from jsonschema_spark.operators.profile import fd_violations

    rows = [
        ("a", 1), ("a", 1), ("a", 2),      # a: 2 dep values, repair 1
        ("b", 3), ("b", 3),                # b: clean
        ("c", 4), ("c", 5), ("c", 5), ("c", 6),  # c: 3 values, repair 2
        (None, 9), ("d", None),            # NULLs excluded
    ]
    df = spark.createDataFrame(rows, "x string, y int")
    out = fd_violations(df, [("x", "y")]).collect()[0]
    assert out["n_groups"] == 3
    assert out["n_violating_groups"] == 2
    assert out["n_repair_rows"] == 3
    assert out["holds"] is False


def test_fd_holds_on_key(spark):
    from jsonschema_spark.operators.profile import fd_violations

    df = spark.createDataFrame([(i, i % 5) for i in range(40)], "k long, v long")
    out = fd_violations(df, [("k", "v")]).collect()[0]
    assert out["holds"] is True and out["n_repair_rows"] == 0


def test_benford_multiplicative_passes_uniform_fails(spark):
    import math

    from jsonschema_spark.operators.profile import benford_first_digit

    # geometric/multiplicative series follows Benford closely
    mult = [(1.07 ** i,) for i in range(1, 600)]
    uni = [(float(100 + i),) for i in range(600)]  # uniform in [100, 700)
    chi_m = sum(
        r["chi2_term"]
        for r in benford_first_digit(
            spark.createDataFrame(mult, "v double"), "v"
        ).collect()
    )
    chi_u = sum(
        r["chi2_term"]
        for r in benford_first_digit(
            spark.createDataFrame(uni, "v double"), "v"
        ).collect()
    )
    assert chi_m < 20.0 < chi_u  # chi2(8) 99th pct ~ 20.1


def test_benford_probabilities_sum_to_one(spark):
    from jsonschema_spark.operators.profile import benford_first_digit

    df = spark.createDataFrame([(float(i),) for i in range(1, 500)], "v double")
    rows = benford_first_digit(df, "v").collect()
    assert sum(r["n"] for r in rows) == 499
    assert sum(r["p_obs"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["p_exp"] for r in rows) == pytest.approx(1.0, abs=1e-4)


# ------------------------------------------------------------- intervals

def _merge(spark, rows):
    from jsonschema_spark.operators.rangejoin import merge_intervals

    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = merge_intervals(df, key_col="k", start_col="s", end_col="e")
    return sorted(
        (r["key"], r["start"], r["end"], r["n_src"]) for r in out.collect()
    )


def test_intervals_overlap_touch_gap(spark):
    rows = [
        ("a", 0, 10), ("a", 5, 15),   # overlap -> [0,15)
        ("a", 15, 20),                # touching -> joins island
        ("a", 25, 30),                # gap -> new island
        ("b", 0, 1),
    ]
    assert _merge(spark, rows) == [
        ("a", 0, 20, 3),
        ("a", 25, 30, 1),
        ("b", 0, 1, 1),
    ]


def test_intervals_contained_and_identical(spark):
    rows = [("k", 0, 100), ("k", 10, 20), ("k", 10, 20), ("k", 90, 150)]
    assert _merge(spark, rows) == [("k", 0, 150, 4)]


def test_intervals_islands_are_disjoint_and_conserve(spark):
    import random

    rng = random.Random(11)
    rows = [("k", s, s + rng.randint(1, 40)) for s in rng.sample(range(2000), 120)]
    merged = _merge(spark, rows)
    assert sum(n for _, _, _, n in merged) == len(rows)
    prev_end = None
    for _, s, e, _ in merged:
        assert s < e
        if prev_end is not None:
            assert s > prev_end  # strict gap between islands
        prev_end = e
    # coverage equals the brute-force point union
    covered = set()
    for _, s, e in ((k, s, e) for k, s, e in [(r[0], r[1], r[2]) for r in rows]):
        covered.update(range(s, e))
    assert sum(e - s for _, s, e, _ in merged) == len(covered)


# ------------------------------------------------------ JSON key profile

def test_json_key_profile_types_and_required(spark):
    from jsonschema_spark.operators.profile import json_key_profile

    rows = [
        ('{"a": 1, "b": "x", "c": 1.5}',),
        ('{"a": 2, "b": "y", "d": [1,2]}',),
        ('{"a": "mixed", "b": "z", "e": {"f": 1}, "g": true, "h": null}',),
        (None,),  # null docs excluded from the denominator
    ]
    df = spark.createDataFrame(rows, "j string")
    got = {
        (r["key"], r["jtype"]): (r["n"], r["required"])
        for r in json_key_profile(df, "j").collect()
    }
    assert got == {
        ("a", "integer"): (2, True),   # key 'a' present everywhere -> required
        ("a", "string"): (1, True),    # ... even though its TYPE is mixed
        ("b", "string"): (3, True),
        ("c", "number"): (1, False),
        ("d", "array"): (1, False),
        ("e", "object"): (1, False),
        ("g", "boolean"): (1, False),
        ("h", "null"): (1, False),
    }


def test_json_key_profile_integral_doubles_are_integers(spark):
    # JSON-Schema exact-number semantics: 11.0 IS an integer (reference
    # big.Rat rule); the variant parser normalizes the trailing zero
    from jsonschema_spark.operators.profile import json_key_profile

    df = spark.createDataFrame([('{"x": 11.0}',), ('{"x": 11.5}',)], "j string")
    got = {(r["key"], r["jtype"]): r["n"] for r in json_key_profile(df, "j").collect()}
    assert got == {("x", "integer"): 1, ("x", "number"): 1}


def test_infer_then_validate_roundtrip(spark):
    import json

    from jsonschema_spark.compat import schema_compat
    from jsonschema_spark.evaluator import Evaluator
    from jsonschema_spark.operators.profile import (
        json_key_profile,
        schema_from_profile,
    )

    docs = [
        {"a": 1, "b": "x"},
        {"a": 2, "b": "y", "c": [1, 2]},
        {"a": 3.5, "b": "z", "d": {"e": 1}},
    ]
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], "j string")
    profile = json_key_profile(df, "j").collect()
    schema = schema_from_profile(profile)
    assert schema["required"] == ["a", "b"]
    assert schema["properties"]["a"]["type"] == ["integer", "number"]
    # the proposed schema accepts every document it was profiled from
    ev = Evaluator(schema)
    for d in docs:
        assert ev.validate(d).valid, d
    # drift policing: a snapshot that loses key 'b' and narrows 'a' is
    # caught by schema_compat between the two proposals
    docs2 = [{"a": 1}, {"a": 2}]
    df2 = spark.createDataFrame([(json.dumps(d),) for d in docs2], "j string")
    schema2 = schema_from_profile(json_key_profile(df2, "j").collect())
    breaking = [f for f in schema_compat(schema, schema2) if f["breaking"]]
    assert any(f["change"] == "type_narrowed" for f in breaking)


# ------------------------------------------------- trend / concentration

def test_trend_slope_exact_line(spark):
    from jsonschema_spark.operators.timeseries import trend_slope

    rows = [("k", i, 2.0 * i + 3.0) for i in range(10)]
    df = spark.createDataFrame(rows, "key string, x int, y double")
    out = trend_slope(df, key_col="key", x_col="x", y_col="y").collect()[0]
    assert out["slope"] == pytest.approx(2.0, abs=2e-6)
    assert out["intercept"] == pytest.approx(3.0, abs=2e-6)
    assert out["r2"] == pytest.approx(1.0, abs=2e-6)


def test_trend_slope_degenerate_x_is_null(spark):
    from jsonschema_spark.operators.timeseries import trend_slope

    df = spark.createDataFrame([("k", 5, 1.0), ("k", 5, 2.0)], "key string, x int, y double")
    out = trend_slope(df, key_col="key", x_col="x", y_col="y").collect()[0]
    assert out["slope"] is None and out["r2"] is None


def test_concentration_uniform_vs_dominated(spark):
    from jsonschema_spark.operators.stats import concentration

    uni = spark.createDataFrame([(i % 50,) for i in range(500)], "k int")
    dom = spark.createDataFrame(
        [(0,)] * 951 + [(i,) for i in range(1, 50)], "k int"
    )
    u = concentration(uni, "k").collect()[0]
    d = concentration(dom, "k").collect()[0]
    assert u["gini"] == pytest.approx(0.0, abs=2e-6)  # perfectly equal
    assert u["top1_share"] == pytest.approx(10 / 500, abs=2e-6)
    assert d["gini"] > 0.9
    assert d["top1_share"] == pytest.approx(0.951, abs=2e-6)
    assert d["hhi"] > 0.9
    assert u["hhi"] == pytest.approx(1 / 50, abs=2e-6)


def test_concentration_gini_matches_reference_formula(spark):
    from jsonschema_spark.operators.stats import concentration

    counts = [5, 1, 9, 3, 7, 7, 2]
    rows = [(k,) for k, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "k int")
    out = concentration(df, "k").collect()[0]
    cs = sorted(counts)
    n, tot = len(cs), sum(cs)
    gini = 2 * sum((i + 1) * c for i, c in enumerate(cs)) / (n * tot) - (n + 1) / n
    assert out["gini"] == pytest.approx(gini, abs=2e-6)


# ------------------------------------------- threshold pick / calibration

def test_threshold_pick_separable(spark):
    from jsonschema_spark.operators.quality_model import threshold_pick_bucketed

    rows = [(float(-5 - i % 3), False) for i in range(50)] + [
        (float(5 + i % 3), True) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "score double, pos boolean")
    out = threshold_pick_bucketed(df, "score", "pos").collect()[0]
    assert out["youden_j"] == pytest.approx(1.0, abs=2e-6)
    assert out["precision"] == pytest.approx(1.0, abs=2e-6)
    assert out["recall"] == pytest.approx(1.0, abs=2e-6)
    assert -5.0 < out["threshold"] <= 5.0  # lies in the gap
    assert (out["n_pos"], out["n_neg"]) == (40, 50)


def test_threshold_pick_tie_breaks_low(spark):
    from pyspark.sql import functions as SF

    from jsonschema_spark.operators.quality_model import threshold_pick_bucketed

    # candidates are the occupied bucket edges (ROC vertices); when every
    # candidate shares the same J, the LOWEST threshold must win
    rows = [(-8.0, False), (-8.0, True), (8.0, False), (8.0, True)]
    df = spark.createDataFrame(rows, "score double, pos boolean")
    out = threshold_pick_bucketed(df, "score", "pos").collect()[0]
    assert out["youden_j"] == pytest.approx(0.0, abs=2e-6)  # uninformative gate
    assert out["threshold"] == pytest.approx(-8.0, abs=1e-9)


def test_threshold_pick_separable_candidate_is_positive_edge(spark):
    from jsonschema_spark.operators.quality_model import threshold_pick_bucketed

    rows = [(-20.0, False)] * 5 + [(20.0, True)] * 5
    df = spark.createDataFrame(rows, "score double, pos boolean")
    out = threshold_pick_bucketed(df, "score", "pos").collect()[0]
    assert out["youden_j"] == pytest.approx(1.0, abs=2e-6)
    assert out["threshold"] == pytest.approx(20.0, abs=1e-9)  # positives' bucket edge


def test_calibration_deciles_monotone_and_conserve(spark):
    from jsonschema_spark.operators.quality_model import (
        calibration_deciles_bucketed,
    )

    import random

    rng = random.Random(3)
    rows = []
    for _ in range(2000):
        s = rng.uniform(-10, 10)
        rows.append((s, rng.random() < 1 / (1 + 2.718281828 ** (-s))))
    df = spark.createDataFrame(rows, "score double, pos boolean")
    out = sorted(
        calibration_deciles_bucketed(df, "score", "pos").collect(),
        key=lambda r: r["decile"],
    )
    assert sum(r["n"] for r in out) == 2000
    # equal-count deciles within histogram-bucket granularity
    assert all(150 <= r["n"] <= 250 for r in out)
    # calibration: pos_rate grows with mean_score across the sweep
    assert out[0]["pos_rate"] < 0.25 and out[-1]["pos_rate"] > 0.75
    assert [r["mean_score"] for r in out] == sorted(r["mean_score"] for r in out)


def test_kmv_intersect_estimate_accuracy(spark):
    from jsonschema_spark.operators.sketches import (
        kmv_build,
        kmv_intersect_estimate,
    )

    # |A|=3000, |B|=2000, |A∩B|=1000 (B = 2000..3999)
    a = spark.createDataFrame([(f"u{i}",) for i in range(3000)], "t string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(2000, 4000)], "t string")
    out = kmv_intersect_estimate(
        kmv_build(a, "t", k=256), kmv_build(b, "t", k=256), k=256
    ).collect()[0]
    assert abs(out["est_union"] - 4000) / 4000 < 0.25
    assert abs(out["est_intersection"] - 1000) / 1000 < 0.45  # ratio compounds error
    assert 0.15 < out["jaccard"] < 0.35  # true 0.25


def test_kmv_intersect_disjoint_is_zero(spark):
    from jsonschema_spark.operators.sketches import (
        kmv_build,
        kmv_intersect_estimate,
    )

    a = spark.createDataFrame([(f"x{i}",) for i in range(500)], "t string")
    b = spark.createDataFrame([(f"y{i}",) for i in range(500)], "t string")
    out = kmv_intersect_estimate(
        kmv_build(a, "t", k=64), kmv_build(b, "t", k=64), k=64
    ).collect()[0]
    assert out["n_both"] == 0
    assert out["est_intersection"] == 0 and out["jaccard"] == 0.0


def test_rank_churn_identical_halves_is_one(spark, tmp_path):
    # identical text in both halves -> identical rankings -> rho == 1
    import os

    rows = [(i, "alpha beta gamma delta " * (1 + i % 3), "en", "src1", 10)
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    d = str(tmp_path / "sfq")
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    from jsonschema_spark.queries import rank_churn_docs

    out = rank_churn_docs(spark, d).collect()[0]
    assert out["spearman"] == pytest.approx(1.0, abs=2e-6)


def test_rank_churn_reversed_rankings_is_negative(spark, tmp_path):
    import os

    # half 0 dominated by 'aaa', half 1 by 'zzz' with mirrored frequencies
    rows = []
    vocab = ["aaa", "bbb", "ccc", "ddd", "eee"]
    did = 0
    for i, t in enumerate(vocab):
        rows.append((did, ((t + " ") * (10 * (5 - i))).strip(), "en", "s", 1)); did += 2
    for i, t in enumerate(vocab):
        rows.append((1 + 2 * i, ((t + " ") * (10 * (i + 1))).strip(), "en", "s", 1))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    d = str(tmp_path / "sfr")
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    from jsonschema_spark.queries import rank_churn_docs

    out = rank_churn_docs(spark, d).collect()[0]
    assert out["n_common"] == 5
    assert out["spearman"] == pytest.approx(-1.0, abs=2e-6)  # perfectly reversed


def test_weekday_anomaly_flags_planted_outlier(spark, tmp_path):
    import datetime
    import os

    # 6 weeks of flat Saturdays except one planted 10x spike
    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 6, 12, 0)  # a Saturday
    for wk in range(6):
        day = base + datetime.timedelta(weeks=wk)
        v = 1000.0 if wk == 3 else 100.0
        for i in range(5):
            rows.append((eid, day + datetime.timedelta(minutes=i), 1, "click", v, None))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "sfw")
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    from jsonschema_spark.queries import weekday_anomaly_events

    out = weekday_anomaly_events(spark, d).collect()
    assert len(out) == 1
    assert out[0]["day"] == "2024-01-27" and out[0]["z"] > 2.0
