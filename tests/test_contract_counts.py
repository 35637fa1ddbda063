"""Single source of truth for the driver-contract counts: queries(),
oracle_sql(), the bench headline list, and the README claim must stay in
lockstep (they drifted in round 3: README said 59, then 50; queries() was
60). Pure-Python — no Spark session."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, filename):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REPO, filename))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_query_has_an_oracle_and_vice_versa():
    entry = _load("__spark_entry__", "__spark_entry__.py")
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(oracles), (
        f"queries without oracle: {sorted(set(qs) - set(oracles))}; "
        f"oracles without query: {sorted(set(oracles) - set(qs))}"
    )


def test_bench_headline_names_resolve():
    entry = _load("__spark_entry__", "__spark_entry__.py")
    bench = _load("bench", "bench.py")
    qs = entry.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"


def test_bench_covers_whole_contract():
    """HEADLINE plus the explicit exclusion list must PARTITION the contract:
    every queries() entry is either benched or excluded-with-a-reason, and
    nothing is both (closes the round-4 bench/contract drift)."""
    entry = _load("__spark_entry__", "__spark_entry__.py")
    bench = _load("bench", "bench.py")
    qs = set(entry.queries())
    headline = set(bench.HEADLINE)
    excluded = set(bench.BENCH_EXCLUDED)
    assert len(bench.HEADLINE) == len(headline), "duplicate names in HEADLINE"
    assert not (headline & excluded), f"both benched and excluded: {sorted(headline & excluded)}"
    assert headline | excluded == qs, (
        f"unbenched without reason: {sorted(qs - headline - excluded)}; "
        f"stale bench names: {sorted((headline | excluded) - qs)}"
    )
    assert all(bench.BENCH_EXCLUDED.values()), "every exclusion needs a reason"


def test_readme_claim_matches_queries():
    entry = _load("__spark_entry__", "__spark_entry__.py")
    n = len(entry.queries())
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    assert f"`queries()` ({n})" in readme, (
        f"README driver-contract count drifted: queries() has {n} entries"
    )
    assert f"`oracle_sql()` ({n}" in readme
