"""Prototypicality-based data pruning over an embedding column — the
"keep the hard/diverse examples" stage of D4 (Tirumala et al., 2023) and
SSL-prototypes (Sorscher et al., 2022): coarse-cluster the corpus, score
each item by cosine to its own cluster centroid (prototypicality), and drop
the most prototypical fraction per cluster (near-centroid items are the
most redundant once SemDeDup has removed exact semantic dupes).

Plan shape (the contract at 100 TB):
- Cell assignment is the same single-projection argmax as
  `operators/semdedup.semantic_dedup` — the centroid matrix is a
  compile-time literal (`simsearch.centroid_dots`), so each vector computes
  all n_cells dots in one narrow projection: one row in, one row out, no
  crossJoin, no per-vector window.
- The only exchange is ONE shuffle on `cell` for the per-cell rank window.
  With n_cells grown ∝ corpus size (the same contract as SemDeDup), cell
  size — and so window partition size — stays constant at any corpus scale.
- The drop count per cell is exact integer arithmetic
  (``cnt * drop_num div drop_den``), so engines agree bit-for-bit and the
  kept set is deterministic (rank ties broken by ascending id).

Quantizer: deterministic lowest-id unit centroids (`fit_unit_centroids`)
so the whole operator is ANSI-SQL-expressible for the DuckDB oracle; swap
in `fit_spherical_kmeans_centroids` at production scale — the plan shape is
identical, only the literal matrix changes.

Reference scope note: kaptinlin/jsonschema has no embedding ops — this is
part of the beyond-reference training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jsonschema_spark.operators.semdedup import _unit, fit_unit_centroids
from jsonschema_spark.operators.simsearch import centroid_dots

__all__ = ["prototypicality", "prototype_prune"]


def prototypicality(
    emb: DataFrame,
    *,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple] | None = None,
) -> DataFrame:
    """(id, cell, proto) — cell is the argmax-cosine centroid id, proto the
    cosine to that centroid snapped to a 1e-6 grid via nudge-then-floor
    (floor(x·1e6 + 1e-6)/1e6, applied BEFORE any ranking so cross-engine
    float jitter cannot reorder ties). Not round(): Spark's round()
    decimal-rounds the double's SHORTEST decimal representation (Java
    BigDecimal.valueOf) while DuckDB rounds the exact binary value — on a
    decimal tie like 0.21903249999…→"0.2190325" the engines disagree by
    1e-6. Not bare floor() either: self-cosines sit exactly ON the 1.0 grid
    line, and ~1e-16 engine jitter in the dot product splits them across it
    (0.999999 vs 1.0). The +1e-6 nudge (1e-12 in x-units scaled to the 1e6
    grid — far above the ~1e-9 jitter, far below the grid spacing) pushes
    every mathematically-on-grid value safely past its own line."""
    unit = _unit(emb, id_col, vec_col)
    if centroids is None:
        centroids = fit_unit_centroids(emb, n_cells, id_col=id_col, vec_col=vec_col)
    cent_vecs = [c[1] for c in centroids]
    id_lit = F.array(*[F.lit(c[0]) for c in centroids])
    # one projection: all dots, argmax cell (ties -> lowest index == lowest
    # cent_id; cent rows are id-ascending), max dot IS the prototypicality
    # because both sides are unit vectors.
    return unit.withColumn("__affs", centroid_dots("u", cent_vecs)).select(
        "id",
        F.element_at(
            id_lit, F.array_position(F.col("__affs"), F.array_max("__affs")).cast("int")
        ).alias("cell"),
        (
            F.floor(F.array_max("__affs") * F.lit(1000000.0) + F.lit(0.000001))
            / F.lit(1000000.0)
        ).alias("proto"),
    )


def prototype_prune(
    emb: DataFrame,
    *,
    n_cells: int = 16,
    drop_num: int = 1,
    drop_den: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple] | None = None,
) -> DataFrame:
    """(id, cell, proto, proto_rank, kept) — one row per input vector.

    Within each cell, items are ranked by descending prototypicality
    (ties: ascending id); the top ``cnt * drop_num div drop_den`` ranks are
    dropped (kept = false). drop_num/drop_den is an exact rational so the
    cut index is integer-identical across engines — never a float fraction.
    """
    assigned = prototypicality(
        emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col, centroids=centroids
    )
    w = Window.partitionBy("cell").orderBy(F.desc("proto"), F.asc("id"))
    wc = Window.partitionBy("cell")
    ranked = assigned.select(
        "id",
        "cell",
        "proto",
        F.row_number().over(w).alias("proto_rank"),
        F.count(F.lit(1)).over(wc).alias("__cnt"),
    )
    drop_n = F.expr(f"__cnt * {int(drop_num)} div {int(drop_den)}")
    return ranked.select(
        "id", "cell", "proto", "proto_rank", (F.col("proto_rank") > drop_n).alias("kept")
    )
