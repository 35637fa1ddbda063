"""Property-based laws for the session-4 operators: leakage-safe split
group coherence on arbitrary cluster relations, robust_outliers parity
with a Python median/MAD reference (and its breakdown property), and
snapshot-churn conservation laws on random manifest edits."""

from __future__ import annotations

import statistics

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------- leakage_safe_split laws --------------------------


@given(
    n=st.integers(min_value=5, max_value=60),
    edges=st.lists(
        st.tuples(st.integers(0, 59), st.integers(0, 59)), max_size=30
    ),
)
@settings(**_SETTINGS)
def test_leakage_split_group_coherence(spark, n, edges):
    """For ANY cluster relation (min-reachable-id labels over random
    edges): members of a cluster share (split_key, split); rows are
    neither lost nor duplicated; singletons key on themselves."""
    from jsonschema_spark.operators.sampling import leakage_safe_split

    # components via union-find on the driver — the ground truth
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a < n and b < n:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    label = {i: find(i) for i in range(n)}
    clustered = [(i, label[i]) for i in range(n) if any(
        label[j] == label[i] and j != i for j in range(n))]

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(n)], "doc_id long, text string"
    )
    clusters = (
        spark.createDataFrame(clustered, "id long, cluster_id long")
        if clustered
        else spark.createDataFrame([], "id long, cluster_id long")
    )
    rows = leakage_safe_split(
        docs, clusters, {"train": 0.7, "val": 0.15, "test": 0.15}
    ).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(n))
    by_doc = {r["doc_id"]: r for r in rows}
    for i in range(n):
        mates = [j for j in range(n) if label[j] == label[i]]
        if len(mates) > 1:
            assert {(by_doc[j]["split_key"], by_doc[j]["split"]) for j in mates} == {
                (str(label[i]), by_doc[i]["split"])
            }
        else:
            assert by_doc[i]["split_key"] == str(i)


# --------------------------- robust_outliers laws ---------------------------


@given(
    vals=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
        min_size=3,
        max_size=80,
    ),
    k=st.sampled_from([1.5, 3.5]),
)
@settings(**_SETTINGS)
def test_robust_outliers_matches_python_reference(spark, vals, k):
    from jsonschema_spark.operators.stats import robust_outliers

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    row = robust_outliers(df, ["x"], k=k).collect()[0]

    def snap(x):
        import math

        return math.floor(x * 1e6 + 1e-6) / 1e6

    med = snap(statistics.median(vals))
    mad = snap(statistics.median(abs(v - med) for v in vals))
    n_out = sum(1 for v in vals if abs(v - med) > k * mad)
    assert row["n_present"] == len(vals)
    assert abs(row["med"] - med) <= 1e-6 and abs(row["mad"] - mad) <= 1e-6
    assert row["n_outliers"] == n_out


def test_robust_median_breakdown_vs_mean(spark):
    """50% breakdown: corrupting 30% of rows with a huge tail moves the
    mean arbitrarily but the median stays inside the inlier range."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.stats import robust_outliers

    inliers = [100.0 + (i % 5) for i in range(70)]
    corrupted = inliers + [1e9] * 30
    df = spark.createDataFrame([(v,) for v in corrupted], "x double")
    row = robust_outliers(df, ["x"], k=3.5).collect()[0]
    mean = df.agg(F.avg("x")).collect()[0][0]
    assert mean > 1e8  # the mean is gone
    assert 100.0 <= row["med"] <= 105.0  # the median is not
    assert row["n_outliers"] == 30


# --------------------------- snapshot churn laws ----------------------------


@given(
    n_cur=st.integers(min_value=0, max_value=25),
    n_extra_base=st.integers(min_value=0, max_value=10),
    stale_mod=st.integers(min_value=2, max_value=7),
)
@settings(**_SETTINGS)
def test_churn_counters_conserve(spark, n_cur, n_extra_base, stale_mod):
    """added + changed + unchanged == |current|; removed == |base \\ current|;
    recomputing against the output-equivalent manifest zeroes the churn."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.snapshot import (
        content_digest,
        snapshot_churn_stats,
    )

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )

    def doc(i, txt):
        return (f"d{i}", [{"kind": "text", "text": txt, "media_ref": None, "offset": 0}])

    cur_rows = [doc(i, f"v2-{i}" if i % stale_mod == 0 else f"v1-{i}") for i in range(n_cur)]
    base_rows = [doc(i, f"v1-{i}") for i in range(n_cur)] + [
        doc(1000 + i, "gone") for i in range(n_extra_base)
    ]
    cur = spark.createDataFrame(cur_rows, schema) if cur_rows else spark.createDataFrame([], schema)
    old = spark.createDataFrame(base_rows, schema) if base_rows else spark.createDataFrame([], schema)
    base = old.select("doc_id", content_digest(F.col("spans")).alias("digest"))
    r = snapshot_churn_stats(cur, base).collect()[0]
    n_changed_expected = sum(1 for i in range(n_cur) if i % stale_mod == 0)
    assert r["n_added"] == 0
    assert r["n_removed"] == n_extra_base
    assert r["n_changed"] == n_changed_expected
    assert (r["n_added"] or 0) + (r["n_changed"] or 0) + (r["n_unchanged"] or 0) == n_cur
