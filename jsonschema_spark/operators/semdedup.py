"""SemDeDup-style semantic deduplication over an embedding column.

Global embedding near-dup (operators/simsearch.cosine_near_dup_pairs) prunes
with hyperplane LSH; SemDeDup (Abbas et al., 2023) is the other standard
scale path: coarse-cluster the corpus, then compare pairs ONLY within a
cluster. The quadratic term is bounded per cell — with n_cells grown
proportionally to the corpus, cell size (and so per-cell pair work) stays
constant while the cell join itself is a plain shuffle-on-cell.

Quantizer: the same deterministic coarse centroids as simsearch.ivf_topk
(the n_cells lowest-id vectors; argmax-cosine assignment, ties to the lower
cent_id) so the whole operator — including cell assignment — is expressible
in ANSI SQL for the DuckDB oracle. Swap in k-means centroids at production
scale; the plan shape is the contract, the quantizer is pluggable.

Assignment plan: the centroid matrix is collected to the driver (n_cells
rows — the quantizer model, not data) and folded as a compile-time literal
(simsearch.centroid_dots), so every vector computes all n_cells dots in one
projection and argmaxes with array_position — one row in, one row out, no
crossJoin row amplification and no per-vector window shuffle. The n_cells
scaling contract: grow n_cells ∝ corpus size so cell size (and the
within-cell quadratic term) stays constant; assignment stays a narrow
projection at any n_cells.

Drop rule (deterministic): an item is dropped iff some LOWER-id item in its
cell has cosine >= threshold — the canonical keep-first-representative rule,
expressed as one within-cell pair join + a max aggregation. Cosines are
rounded to 6 decimals BEFORE thresholding so row membership is identical
across engines (float jitter is ~1e-16).

Reference scope note: kaptinlin/jsonschema has no embedding ops — this is
part of the beyond-reference training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.simsearch import _dot, _norm, centroid_dots

__all__ = ["semantic_dedup", "fit_unit_centroids", "fit_spherical_kmeans_centroids"]


def _unit(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # Cast float32 storage to double BEFORE any arithmetic: Spark's `x*x`
    # inside the norm fold is float×float→float when elements are float32,
    # rounding each square to 24-bit precision (~1e-8 relative error per
    # term, ~5e-9 in the norm) — while every DuckDB oracle casts to DOUBLE
    # up front. Without the cast, self-cosines land ~2e-9 under 1.0 on the
    # Spark side only, splitting across the 6-decimal grid the oracles
    # compare on.
    base = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    # norm staged in its own projection — HOF lambdas have no CSE
    return base.withColumn("__n", _norm(F.col("vec"))).select(
        "id",
        F.when(
            F.col("__n") > 0.0, F.transform("vec", lambda x: x / F.col("__n"))
        ).otherwise(F.col("vec")).alias("u"),
    )


def fit_unit_centroids(
    emb: DataFrame,
    n_cells: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple]:
    """Quantizer model for semantic_dedup: the n_cells lowest-id UNIT vectors
    as (cent_id, unit_vec) tuples — normalization runs through the same Spark
    expressions as the corpus side, so cosines stay bitwise identical. Cache
    and reuse across queries over the same corpus."""
    unit = _unit(emb, id_col, vec_col)
    return [(r["id"], list(r["u"])) for r in unit.orderBy("id").limit(n_cells).collect()]


def fit_spherical_kmeans_centroids(
    emb: DataFrame,
    n_cells: int,
    *,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple]:
    """Spherical k-means — the production quantizer for COSINE consumers
    (`semantic_dedup`, or `ivf_topk` at scale): Lloyd's on the unit sphere,
    where each update renormalizes the cell mean so centroids stay unit
    vectors and argmax-dot assignment IS argmax-cosine. Returns the
    `fit_unit_centroids` model shape [(cell_idx, unit_vec)], so
    `semantic_dedup(..., centroids=...)` takes it unchanged.

    Same scale plan as `simsearch.fit_kmeans_centroids` (one literal-fold
    assignment projection + one map-side-combining groupBy to k·(dim+1)
    numbers per iteration); on unit centroids the Euclidean affinity
    v·c − ½‖c‖² reduces to v·c − ½, so `kmeans_assign` works verbatim and
    ties break to the lowest cell exactly like the SQL-oracled assignment.
    Deterministic: lowest-id unit-vector seeds; a cell that captures
    nothing, or whose members sum to the zero vector, keeps its previous
    centroid."""
    import math

    from jsonschema_spark.operators.simsearch import kmeans_assign

    if n_cells < 1:
        raise ValueError("n_cells must be >= 1")
    unit = _unit(emb, id_col, vec_col)
    seed_rows = unit.orderBy("id").limit(n_cells).collect()
    if len(seed_rows) < n_cells:
        raise ValueError(
            f"corpus has only {len(seed_rows)} rows; cannot seed {n_cells} cells"
        )
    cents: list[list[float]] = [[float(x) for x in r["u"]] for r in seed_rows]
    dim = len(cents[0])

    base = unit.select(F.col("u").alias("__v"))
    for _ in range(n_iters):
        assigned = kmeans_assign(
            base, [(c, cents[c], 0.0) for c in range(n_cells)], vec_col="__v", out_col="__cell"
        ).select("__cell", "__v")
        stats = (
            assigned.groupBy("__cell")
            .agg(*[F.sum(F.element_at("__v", i + 1)).alias(f"__s{i}") for i in range(dim)])
            .collect()
        )
        by_cell = {r["__cell"]: r for r in stats}
        new_cents = []
        for c in range(n_cells):
            r = by_cell.get(c)
            if r is None:
                new_cents.append(cents[c])
                continue
            s = [r[f"__s{i}"] for i in range(dim)]
            norm = math.sqrt(sum(x * x for x in s))
            if norm == 0.0:  # antipodal members cancel: keep the old centroid
                new_cents.append(cents[c])
            else:
                new_cents.append([x / norm for x in s])
        cents = new_cents
    return [(c, cents[c]) for c in range(n_cells)]


def semantic_dedup(
    emb: DataFrame,
    *,
    threshold: float = 0.95,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple] | None = None,
) -> DataFrame:
    """(id, cell, nn_lower_cosine, keep) — one row per input vector.

    nn_lower_cosine = max cosine to any lower-id vector in the same cell
    (NULL if the item is the lowest id in its cell or nothing is near);
    keep = nn_lower_cosine IS NULL OR nn_lower_cosine < threshold.

    Shuffles: one on `cell` for the bounded self-join, one tiny groupBy on
    bare ids (16 B/row), one id-join to re-attach verdicts. Centroids are
    broadcast; vectors are unit-normalized ONCE (norm staged in its own
    projection — HOF lambdas have no CSE).
    """
    unit = _unit(emb, id_col, vec_col)
    if centroids is None:
        # quantizer model fit: n_cells lowest-id UNIT vectors; pass
        # `centroids` (fit_unit_centroids) to amortize the fit across queries.
        centroids = fit_unit_centroids(emb, n_cells, id_col=id_col, vec_col=vec_col)
    cent_vecs = [c[1] for c in centroids]
    id_lit = F.array(*[F.lit(c[0]) for c in centroids])
    # argmax-dot cell per vector in ONE projection: unit vectors make the
    # dot the cosine directly; array_position ties to the lowest index ==
    # lowest cent_id (cent_rows are id-ascending), matching the old window's
    # DESC-aff/ASC-cent_id order bit-for-bit.
    cells = (
        unit.withColumn("__affs", centroid_dots("u", cent_vecs))
        .select(
            "id",
            "u",
            F.element_at(
                id_lit, F.array_position(F.col("__affs"), F.array_max("__affs")).cast("int")
            ).alias("cell"),
        )
    )
    a = cells.select(F.col("id").alias("id_a"), "cell", F.col("u").alias("u_a"))
    b = cells.select(F.col("id").alias("id_b"), "cell", F.col("u").alias("u_b"))
    nn = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_b", F.round(_dot(F.col("u_a"), F.col("u_b")), 6).alias("cos"))
        .groupBy("id_b")
        .agg(F.max("cos").alias("nn_lower_cosine"))
    )
    return (
        cells.select("id", "cell")
        .join(nn.withColumnRenamed("id_b", "id"), "id", "left")
        .select(
            "id",
            "cell",
            "nn_lower_cosine",
            (
                F.col("nn_lower_cosine").isNull()
                | (F.col("nn_lower_cosine") < F.lit(threshold))
            ).alias("keep"),
        )
    )
