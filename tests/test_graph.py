"""PageRank operator: matches a NumPy power-iteration reference on a small
directed graph, keeps the (1-d)/N floor for sink-only nodes, and preserves
total mass when the graph has no dangling nodes."""

from __future__ import annotations

import numpy as np
import pytest

from jsonschema_spark.operators.graph import pagerank


def _numpy_pagerank(edges, iterations=3, damping=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for u, _ in set(edges):
        out_deg[idx[u]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1.0 - damping) / n)
        for u, v in set(edges):
            nxt[idx[v]] += damping * rank[idx[u]] / out_deg[idx[u]]
        rank = nxt
    return {nodes[i]: rank[i] for i in range(n)}


@pytest.fixture()
def edges_df(spark):
    edges = [
        ("a", "b"),
        ("a", "c"),
        ("b", "c"),
        ("c", "a"),
        ("d", "c"),  # d has no in-edges: must keep the (1-d)/N floor
    ]
    return edges, spark.createDataFrame(edges, ["src", "dst"])


def test_matches_numpy_reference(edges_df):
    edges, df = edges_df
    got = {r["id"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    want = _numpy_pagerank(edges, iterations=3)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_no_in_edge_node_gets_floor(edges_df):
    edges, df = edges_df
    got = {r["id"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    assert got["d"] == pytest.approx((1.0 - 0.85) / 4, abs=1e-15)


def test_mass_conserved_without_dangling(spark):
    # symmetric graph: every node has out-edges, so total rank mass stays 1
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    edges = pairs + [(v, u) for u, v in pairs]
    df = spark.createDataFrame([(f"n{u}", f"n{v}") for u, v in edges], ["src", "dst"])
    ranks = [r["rank"] for r in pagerank(df, iterations=4).collect()]
    assert sum(ranks) == pytest.approx(1.0, abs=1e-9)
    # ring symmetry: all nodes identical
    assert max(ranks) - min(ranks) < 1e-12


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df, iterations=2).count() == 0


def test_khop_bfs_distances(spark):
    from jsonschema_spark.operators.graph import khop_reachability

    # path graph a-b-c-d-e plus shortcut a-c: BFS distance must pick min
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c")]
    und = edges + [(v, u) for u, v in edges]
    df = spark.createDataFrame(und, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["id"])
    got = {r["id"]: r["hops"] for r in khop_reachability(df, seeds, k=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_khop_early_stop_on_exhausted_frontier(spark):
    from jsonschema_spark.operators.graph import khop_reachability

    df = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["id"])
    got = {r["id"]: r["hops"] for r in khop_reachability(df, seeds, k=10).collect()}
    assert got == {"a": 0, "b": 1}


class TestTriangles:
    def test_known_graph(self, spark):
        from jsonschema_spark.operators.graph import triangle_stats

        # K4 on {1,2,3,4} plus a pendant 5-1: 4 triangles, 6+1 edges
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1)],
            "src long, dst long",
        )
        r = triangle_stats(edges).collect()[0]
        assert r["n_nodes"] == 5 and r["n_edges"] == 7
        assert r["n_triangles"] == 4
        # degrees: 1->4, 2..4->3, 5->1; triples = C(4,2)+3*C(3,2)+0 = 6+9 = 15
        assert r["n_triples"] == 15

    def test_canonicalization(self, spark):
        from jsonschema_spark.operators.graph import triangle_stats

        # duplicates, reversed duplicates, and self-loops all collapse
        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1)],
            "src long, dst long",
        )
        r = triangle_stats(edges).collect()[0]
        assert r["n_nodes"] == 3 and r["n_edges"] == 3 and r["n_triangles"] == 1

    def test_triangle_free(self, spark):
        from jsonschema_spark.operators.graph import triangle_stats

        # star graph: no triangles, all wedges open
        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 6)], "src long, dst long"
        )
        r = triangle_stats(edges).collect()[0]
        assert r["n_triangles"] == 0 and r["n_triples"] == 10
