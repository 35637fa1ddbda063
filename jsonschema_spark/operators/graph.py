"""Link-analysis ranking over an edge relation — PageRank by synchronous
power iteration, the classic "which nodes does the random surfer visit"
score used for domain/source authority weighting in web-corpus curation
(Common Crawl-style harmonic/PageRank centrality as a quality prior).

Scale shape: one iteration is `edges ⋈ ranks ON src` + `groupBy dst` —
a join keyed on src and an aggregation exchange keyed on dst. The edge
relation (with out-degrees attached) is repartitioned on src ONCE and
persisted, so every iteration's join reuses the same partitioning and
only the rank relation (|V| rows, 2 columns) moves. Each round ends in
`localCheckpoint` to truncate the logical plan — the standard guard for
iterative DataFrames (mirrors `dedup.connected_components`); without it
the plan doubles per round and Catalyst re-optimizes the whole history.
Iteration count is a fixed small constant (the operator is synchronous
power iteration, not run-to-convergence), so lineage, shuffle count, and
the SQL oracle's chained-CTE depth are all bounded and identical.

Dangling nodes (out-degree 0) are supported: their mass is NOT
redistributed (the "dangling mass evaporates" simplification) — callers
that need the strict Markov-chain normalization should add reverse edges
or a sink loop. Nodes with no in-edges keep the (1-d)/N floor via the
left join against the full vertex set.

All arithmetic is double; per-node in-contribution sums are tiny (deg(v)
terms), so Spark's and the SQL oracle's summation-order float drift is
~1e-15 relative — far inside the 1e-6 output snap the query layer applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "khop_reachability", "triangle_stats"]


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(id, rank) after `iterations` rounds of synchronous power iteration
    with damping factor `damping`, rank initialized uniformly at 1/N over
    the vertex set (all ids appearing as src or dst). Raw doubles — the
    caller snaps for cross-engine comparison.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("out_deg"))
    # edges with sender out-degree attached: the static per-iteration join
    # side. Partitioned on src once; every round's ranks join lands on it
    # without re-exchanging the edge relation.
    contrib_edges = e.join(deg, "src").repartition("src").persist()
    contrib_edges.count()  # materialize before iterating

    floor_term = F.lit((1.0 - damping) / n)
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    for _ in range(int(iterations)):
        contribs = contrib_edges.join(
            ranks.select(F.col("id").alias("src"), "rank"), "src"
        ).select(
            F.col("dst").alias("id"),
            (F.col("rank") / F.col("out_deg")).alias("contrib"),
        )
        summed = contribs.groupBy("id").agg(F.sum("contrib").alias("in_mass"))
        ranks = (
            verts.join(summed, "id", "left")
            .select(
                "id",
                (
                    floor_term
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    contrib_edges.unpersist()
    verts.unpersist()
    return ranks


def khop_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
) -> DataFrame:
    """(id, hops) for every node reachable from the seed set within k hops,
    hops = BFS distance (0 for seeds). Classic frontier expansion: each
    round joins ONLY the current frontier (not the visited set) against
    the edge relation, anti-joins the visited set, and checkpoints both —
    so per-round work is proportional to the frontier, the edge relation
    is partitioned on src once and reused, and lineage stays flat. The
    visited set carries bare (id, hops) — 2 narrow columns through every
    exchange.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .repartition("src")
        .persist()
    )
    e.count()
    frontier = seeds.select(F.col(seeds.columns[0]).alias("id")).distinct()
    visited = frontier.withColumn("hops", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited.select("id")
    for hop in range(1, int(k) + 1):
        nxt = (
            e.join(frontier.select(F.col("id").alias("src")), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("id")
    e.unpersist()
    return visited


def triangle_stats(edges: DataFrame, *, src: str = "src", dst: str = "dst") -> DataFrame:
    """One-row (n_nodes, n_edges, n_triples, n_triangles) over an undirected
    graph given as an edge relation (self-loops and duplicate/reversed edges
    are canonicalized away). n_triples = sum_v C(deg(v), 2) — open + closed
    wedge centers, the denominator of the global clustering coefficient
    (clustering = 3·triangles / triples).

    Degree-ordered orientation (the standard distributed triangle-counting
    trick — Suri & Vassilvitskii 2011, "Counting Triangles and the Curse of
    the Last Reducer"): orient every edge from the endpoint with the smaller
    (degree, id) key to the larger. Each triangle is then counted EXACTLY
    once from its minimum-key corner, and — the scale property — every
    node's out-degree is bounded by O(sqrt(m)), so the wedge join
    (out-edges ⋈ out-edges on the common tail) cannot blow up on a hot
    celebrity node the way the naive id-ordered enumeration does: the
    highest-degree node is the wedge CENTER of almost nothing because all
    its edges point INTO it.

    Exchanges: degree groupBy (node id), two degree-attach joins (node id),
    wedge self-join keyed on the oriented tail u, closing LEFT SEMI join
    keyed on (b, c). Every shuffled row is 2-3 ids + a degree — no payload.
    The oriented edge relation is localCheckpoint'ed once and reused by all
    three sides of the wedge/closing joins.
    """
    # pairs feeds THREE subtrees (orientation join, degree table, edge
    # count) and deg feeds two — checkpoint each once so the upstream edge
    # build (often itself a join) runs exactly once
    pairs = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("x"),
            F.greatest(F.col(src), F.col(dst)).alias("y"),
        )
        .where(F.col("x") != F.col("y"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        pairs.select(F.col("x").alias("id"))
        .unionByName(pairs.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    j = pairs.join(
        deg.select(F.col("id").alias("x"), F.col("d").alias("dx")), "x"
    ).join(deg.select(F.col("id").alias("y"), F.col("d").alias("dy")), "y")
    kx = F.struct(F.col("dx").alias("d"), F.col("x").alias("i"))
    ky = F.struct(F.col("dy").alias("d"), F.col("y").alias("i"))
    o = j.select(
        F.when(kx < ky, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(kx < ky, F.col("y")).otherwise(F.col("x")).alias("v"),
        F.when(kx < ky, F.col("dy")).otherwise(F.col("dx")).alias("dv"),
    ).localCheckpoint(eager=True)
    e1 = o.select("u", F.col("v").alias("b"), F.col("dv").alias("db"))
    e2 = o.select("u", F.col("v").alias("c"), F.col("dv").alias("dc"))
    wedges = e1.join(e2, "u").where(
        F.struct(F.col("db").alias("d"), F.col("b").alias("i"))
        < F.struct(F.col("dc").alias("d"), F.col("c").alias("i"))
    )
    closed = wedges.join(
        o.select(F.col("u").alias("b"), F.col("v").alias("c")), ["b", "c"], "left_semi"
    )
    nn = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        # d*(d-1) is always even: integer-exact at any degree, no double sum
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("n_triples"),
    )
    ne = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    nt = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    return nn.crossJoin(ne).crossJoin(nt).select(
        "n_nodes", "n_edges", "n_triples", "n_triangles"
    )
