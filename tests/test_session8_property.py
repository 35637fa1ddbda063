"""Property-based laws for the session-8 operators: substring removal
(subsequence + canonical-survivor laws), triangle census invariants on
random graphs, greedy-cover submodularity, HLL register laws, and
group-quantile bounds — all on hypothesis-generated inputs."""

from __future__ import annotations

import itertools
import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@given(seed=st.integers(min_value=0, max_value=9999), k=st.integers(min_value=2, max_value=4))
@settings(**_SETTINGS)
def test_substring_dedup_laws(spark, seed, k):
    from jsonschema_spark.operators.dedup import substring_dedup

    rng = random.Random(seed)
    docs = [
        (i, " ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 20))))
        for i in range(6)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["id"]: r for r in substring_dedup(df, "doc_id", "text", k=k).collect()}
    assert set(out) == {d[0] for d in docs}
    for did, text in docs:
        r = out[did]
        orig = text.split()
        kept = r["clean_text"].split() if r["clean_text"] else []
        # conservation: n_tokens counts the original; removal is bounded
        assert r["n_tokens"] == len(orig)
        assert r["n_removed"] == len(orig) - len(kept)
        # kept tokens are a subsequence of the original in order
        it = iter(orig)
        assert all(tok in it for tok in kept), f"doc {did} not a subsequence"
    # the globally-first occurrence of any duplicated window survives
    # somewhere: total removal can never be 100% of all docs' tokens
    assert any(out[d]["n_removed"] < out[d]["n_tokens"] for d, t in docs if t)


@given(
    n=st.integers(min_value=3, max_value=12),
    p_edge=st.integers(min_value=20, max_value=80),
    seed=st.integers(min_value=0, max_value=9999),
)
@settings(**_SETTINGS)
def test_triangle_census_matches_bruteforce(spark, n, p_edge, seed):
    from jsonschema_spark.operators.graph import triangle_stats

    rng = random.Random(seed)
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if rng.randint(0, 99) < p_edge
    ]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    r = triangle_stats(df).collect()[0]
    es = {frozenset(e) for e in edges}
    tri = sum(
        1
        for a, b, c in itertools.combinations(sorted({v for e in edges for v in e}), 3)
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= es
    )
    assert r["n_triangles"] == tri
    assert r["n_edges"] == len(es)
    # every triangle contributes 3 closed wedges bounded by all wedges
    assert 3 * r["n_triangles"] <= r["n_triples"]


@given(seed=st.integers(min_value=0, max_value=9999))
@settings(**_SETTINGS)
def test_greedy_cover_laws(spark, seed):
    from jsonschema_spark.operators.cover import greedy_cover

    rng = random.Random(seed)
    docs = [
        (i, " ".join(rng.choice(_WORDS) for _ in range(rng.randint(3, 15))))
        for i in range(8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = greedy_cover(df, "doc_id", "text", k=4).collect()
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)  # submodularity
    assert all(g > 0 for g in gains)
    ids = [r["doc_id"] for r in rows]
    assert len(set(ids)) == len(ids)  # no doc picked twice
    # running total is the cumulative sum of gains
    totals = [r["covered_total"] for r in rows]
    assert totals == [sum(gains[: i + 1]) for i in range(len(gains))]


@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=99),
)
@settings(**_SETTINGS)
def test_hll_register_laws(spark, n, seed):
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.sketches import hll_build

    df = spark.range(n).select(
        F.concat(F.lit(f"s{seed}:"), F.col("id").cast("string")).alias("t")
    )
    regs = hll_build(df, "t").collect()
    assert len(regs) <= min(n, 256)
    for r in regs:
        assert 0 <= r["reg"] <= 255
        assert 1 <= r["max_rho"] <= 121


@given(seed=st.integers(min_value=0, max_value=9999))
@settings(**_SETTINGS)
def test_group_quantiles_bounds_and_monotonicity(spark, seed):
    from jsonschema_spark.operators.stats import group_quantiles

    rng = random.Random(seed)
    rows = [
        (rng.choice(["a", "b"]), float(rng.randint(0, 50))) for _ in range(120)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = group_quantiles(df, "g", "v", probs=(0.1, 0.5, 0.9))
    by_g: dict = {}
    for r in out.collect():
        by_g.setdefault(r["g"], {})[r["p"]] = r["q"]
    for g, qs in by_g.items():
        vals = [v for gg, v in rows if gg == g]
        assert min(vals) <= qs[0.1] <= qs[0.5] <= qs[0.9] <= max(vals)
