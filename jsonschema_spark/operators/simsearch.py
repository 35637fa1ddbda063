"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline — broadcast the (small) query set,
  `zip_with`+`aggregate` dot products JVM-side, window top-k per query.
- LSH-bucketed ANN: deterministic random-hyperplane signatures (hash-derived
  pseudo-projections, no stored model) bucket the corpus; queries probe only
  their bucket — the 100 TB path where the cross product is infeasible.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "fit_pq_codebooks",
    "pq_encode",
    "pq_topk",
    "ivfpq_topk",
    "fit_residual_pq_codebooks",
    "ivfpq_residual_topk",
    "cosine_similarity",
    "brute_force_topk",
    "hyperplane_projections",
    "band_keys",
    "infer_dim",
    "ann_topk",
    "cosine_near_dup_pairs",
    "centroid_dots",
    "fit_centroids",
    "fit_kmeans_centroids",
    "kmeans_assign",
    "two_level_assign",
    "ivf_topk",
    "pair_set_eval",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_numpy() -> "Column":
    """Arrow-batched numpy dot product (einsum over stacked batches) — ~1.4x
    the end-to-end HOF fold on 12.5M 64-dim pairs (the fold costs ~5µs/pair
    vs ~0.05µs vectorized). Summation order differs from the left-fold, so
    results can differ in the last ulp — oracle-checked queries keep the JVM
    fold; pass dot_method="numpy" where throughput wins."""
    import numpy as np

    @F.pandas_udf("double")
    def pd_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        av = np.stack(a.values)
        bv = np.stack(b.values)
        return pd.Series(np.einsum("ij,ij->i", av, bv))

    return pd_dot


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact top-k per query.

    The query side is broadcast (small); the corpus is scanned once, no
    shuffle until the per-query top-k aggregation.
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    sim = cosine_similarity(F.col(vec_col), F.col(query_vec_col))
    scored = joined.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        sim.alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _plane_signs(p: int, dim: int) -> list[float]:
    """Deterministic ±1 normal for plane p (sha256-derived; no stored model)."""
    import hashlib

    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.sha256(f"{p}:{i}".encode()).digest()
        out.extend(1.0 if b & 1 else -1.0 for b in h)
        i += 1
    return out[:dim]


def infer_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding width from the first row (driver-side, plan time)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dimension from column {vec_col!r}")
    return int(row["d"])


def hyperplane_projections(vec: Column | str, n_planes: int, dim: int) -> Column:
    """All n_planes hyperplane projections of `vec`.

    When `vec` is a column NAME, the projections are emitted as one SQL
    expression of flat per-plane folds (sharing `_dot_sql` — a hyperplane's
    ±1 normal is just a compile-time "centroid"): a single py4j round-trip
    to build, and per element only scalar multiply-adds at runtime. The
    Column form keeps the dim × n_planes matrix fold (one array traversal,
    but it allocates an n_planes-array per element — measured slower than
    the flat form on 64-dim inputs, and ~1.8s of py4j literal construction).
    Per-plane accumulation is `acc[p] += x_i·s_i` for i ascending in BOTH
    forms — bitwise-identical projections. Vectors whose size differs from
    `dim` yield NULL (callers must filter size(vec) == dim; no silent
    truncation — the sign matrix is generated at the actual dimension)."""
    rows = [_plane_signs(p, dim) for p in range(n_planes)]
    if isinstance(vec, str):
        proj = centroid_dots(vec, rows)
        col = F.col(vec)
        return F.when(F.size(col) == dim, proj)
    by_dim = F.array(
        *[F.lit([rows[p][i] for p in range(n_planes)]) for i in range(dim)]
    )
    contrib = F.zip_with(vec, by_dim, lambda x, srow: F.transform(srow, lambda s: x * s))
    proj = F.aggregate(
        contrib,
        F.array_repeat(F.lit(0.0), n_planes),
        lambda acc, c: F.zip_with(acc, c, lambda a, b: a + b),
    )
    return F.when(F.size(vec) == dim, proj)


def band_keys(proj: Column | str, bands: int, rows_per_band: int) -> Column:
    """array<long> of per-band bucket keys from a projections array.

    Banded OR-construction: two vectors are candidates when ANY band's
    rows_per_band sign bits all agree — recall 1-(1-p^r)^b for per-plane
    agreement p = 1 - θ/π. More rows_per_band → more buckets (2^r per band,
    so the bucket count scales with the corpus); more bands → higher recall.
    A string `proj` emits the whole key array as one SQL expression (one
    py4j round-trip instead of bands × rows_per_band)."""
    if isinstance(proj, str):
        parts = []
        for b in range(bands):
            bits = " + ".join(
                f"CAST(element_at(`{proj}`, {b * rows_per_band + j + 1}) > 0 AS BIGINT) * {1 << j}"
                for j in range(rows_per_band)
            )
            parts.append(f"({bits})")
        return F.expr("array(" + ",".join(parts) + ")")
    keys = []
    for b in range(bands):
        bits: Column | None = None
        for j in range(rows_per_band):
            bit = (F.element_at(proj, b * rows_per_band + j + 1) > 0).cast("long") * (1 << j)
            bits = bit if bits is None else bits + bit
        keys.append(bits)
    return F.array(*keys)


def _banded(
    df: DataFrame,
    id_out: str,
    vec_name: str,
    bands: int,
    rows_per_band: int,
    dim: int,
    *,
    spread: int | None = None,
) -> DataFrame:
    """(id_out, band, key) — one row per (vector, band).

    `spread` repartitions BEFORE the projection: the per-vector fold is
    CPU-heavy interpreted work, and a small input (one parquet split) would
    otherwise run it on one core. At production scale file splits provide the
    parallelism and `spread` should stay None — the repartition would shuffle
    the whole corpus."""
    if spread:
        df = df.repartition(spread)
    proj = df.withColumn("__proj", hyperplane_projections(vec_name, bands * rows_per_band, dim))
    return (
        proj.filter(F.col("__proj").isNotNull())
        .select(
            id_out,
            F.posexplode(band_keys("__proj", bands, rows_per_band)).alias("band", "key"),
        )
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
    bands: int = 4,
    rows_per_band: int = 6,
    dim: int | None = None,
    spread: int | None = None,
) -> DataFrame:
    """Approximate top-k: banded hyperplane LSH candidates, exact cosine rank.

    Multi-band OR-construction (not a single signature): a corpus vector is a
    candidate for a query when any band agrees, so recall stays high while
    per-band bucket count (2^rows_per_band) keeps buckets small — the shape
    that survives 10^9 vectors. Candidates are deduped on bare (query, id)
    pairs BEFORE vectors are re-attached for exact scoring.
    """
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    c_keys = _banded(
        corpus.select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__v")),
        "__cid", "__v", bands, rows_per_band, dim, spread=spread,
    )
    q_keys = _banded(
        queries.select(F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__v")),
        "__qid", "__v", bands, rows_per_band, dim,
    )
    cand = (
        c_keys.join(F.broadcast(q_keys), ["band", "key"])
        .select("__qid", "__cid")
        .distinct()
    )
    scored = (
        cand.join(corpus.select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")), "__cid")
        .join(
            F.broadcast(
                queries.select(F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__qv"))
            ),
            "__qid",
        )
        .select(
            F.col("__qid").alias("query_id"),
            F.col("__cid").alias("neighbor_id"),
            cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    bands: int = 8,
    rows_per_band: int = 8,
    dim: int | None = None,
    dot_method: str = "jvm",
    spread: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine >= threshold).

    Scale path: banded hyperplane LSH (OR over `bands` bands of
    `rows_per_band` sign bits — the same multi-table construction as the
    MinHash dedup path), pair-dedup on bare ids, then exact cosine
    verification with vectors re-attached. Per-band bucket domain is
    2^rows_per_band, so bucket granularity scales with the corpus instead of
    capping at 2^n_planes global buckets. Recall ≈ 1-(1-p^r)^b with
    p = 1 - arccos(threshold)/π; defaults give ~0.97 at threshold 0.95."""
    if dim is None:
        dim = infer_dim(emb, vec_col)
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if spread:
        # small-input parallelism: the projection/norm folds are CPU-heavy
        # interpreted work; one parquet split would pin them to one core. At
        # production scale file splits already parallelize — leave None.
        base = base.repartition(spread)
    keyed = _banded(base, "id", "vec", bands, rows_per_band, dim)
    a = keyed.select(F.col("id").alias("id_a"), "band", "key")
    b = keyed.select(F.col("id").alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # dedup on bare ids BEFORE re-attaching vectors
    )
    # normalize ONCE per vector so each verified pair folds a single dot
    # product instead of dot + 2 norms (3x fewer array traversals). The norm
    # is staged in its own projection — HOF lambdas are interpreted with no
    # CSE, so an inlined _norm inside the per-element lambda would cost
    # O(d^2) per vector. Zero-norm vectors pass through unscaled.
    unit = base.withColumn("__n", _norm(F.col("vec"))).select(
        "id",
        F.when(
            F.col("__n") > 0.0, F.transform("vec", lambda x: x / F.col("__n"))
        ).otherwise(F.col("vec")).alias("u"),
    )
    verified = (
        cand.join(unit.select(F.col("id").alias("id_a"), F.col("u").alias("u_a")), "id_a")
        .join(unit.select(F.col("id").alias("id_b"), F.col("u").alias("u_b")), "id_b")
    )
    if dot_method == "numpy":
        cos = _dot_numpy()(F.col("u_a"), F.col("u_b"))
    else:
        cos = _dot(F.col("u_a"), F.col("u_b"))
    return verified.select("id_a", "id_b", F.round(cos, 6).alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def _sql_double(x: float) -> str:
    return f"CAST('{x!r}' AS DOUBLE)"


def _dot_sql(vec_sql: str, c: list[float]) -> str:
    """SQL text for _dot(vec, lit(c)) — same left fold, same 0.0D seed."""
    arr = "array(" + ",".join(_sql_double(x) for x in c) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def centroid_dots(vec: Column | str, centroids: list[list[float]]) -> Column:
    """array<double> of dot products of `vec` against every compile-time
    centroid — the scale path for IVF/SemDeDup cell assignment. The old
    `corpus.crossJoin(broadcast(centroids))` + rank-1 window materialized
    n_cells× the corpus rows AND shuffled them on vec_id for the window; here
    each corpus row stays ONE row, zero shuffle — the same O(n_cells·d) flops
    the crossJoin paid, minus the materialization and the per-vector sort.

    Two formulations, same bitwise result (each dot is a left fold in element
    order, matching `_dot` and DuckDB's list_dot_product, which keeps the
    oracles hash-green):
    - n_cells ≤ 64: one flat `_dot(vec, lit(c))` fold per centroid — small
      expression tree, no intermediate array allocation (the dim × n_cells
      matrix fold allocates d tiny arrays per row; measured slower at small
      n on 2k×64-dim inputs).
    - n_cells > 64: the `hyperplane_projections` dim × n_cells literal-matrix
      layout — all cells in ONE array traversal, expression size O(dim)
      instead of O(n_cells·dim) fold nodes. Per-cell accumulation is still
      `acc[c] += x_i·cent[c][i]` for i ascending, so results stay bitwise
      identical to the flat form. At >10^4 cells, `two_level_assign` is the shipped
      hierarchical path (√K super-cells, then argmax within the matched
      branch only).
    """
    n = len(centroids)
    if isinstance(vec, str):
        # One F.expr for the whole dot array: building the centroid literals
        # Column-by-Column costs O(n_cells·dim) py4j round-trips — measured
        # 1.7-3.8s of pure DRIVER time per query construction at 8×64; the
        # SQL-text form is a single round-trip. repr(float) is the shortest
        # round-tripping decimal and Double.parseDouble rounds it back to the
        # identical IEEE-754 value, so results stay bitwise unchanged.
        dots = ",".join(_dot_sql(f"`{vec}`", c) for c in centroids)
        return F.expr(f"array({dots})")
    if n <= 64:
        return F.array(*[_dot(vec, F.lit(c)) for c in centroids])
    dim = len(centroids[0])
    by_dim = F.array(
        *[F.lit([centroids[c][i] for c in range(n)]) for i in range(dim)]
    )
    contrib = F.zip_with(vec, by_dim, lambda x, crow: F.transform(crow, lambda cc: x * cc))
    return F.aggregate(
        contrib,
        F.array_repeat(F.lit(0.0), n),
        lambda acc, c: F.zip_with(acc, c, lambda a, b: a + b),
    )


def fit_centroids(
    emb: DataFrame,
    n_cells: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple]:
    """Deterministic coarse-quantizer model: the n_cells lowest-id vectors,
    collected to the driver as (cent_id, vec, norm) tuples — the MODEL (a few
    KB), not data; cache and reuse it across jobs over the same corpus the
    way a k-means model would be. Norms are computed by the same Spark
    expressions the crossJoin plan used, so downstream cosines are bitwise
    unchanged. Swap in k-means centroids at production scale — every consumer
    below is quantizer-agnostic."""
    rows = (
        emb.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cent_vec"),
            _norm(F.col(vec_col)).alias("cent_norm"),
        )
        .collect()
    )
    return [(r["cent_id"], list(r["cent_vec"]), float(r["cent_norm"])) for r in rows]


def kmeans_assign(
    df: DataFrame,
    centroids: list[tuple],
    *,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Append `out_col`: the id of the nearest centroid in squared Euclidean
    distance, via argmin ||v−c||² == argmax (v·c − ½||c||²) — ties to the
    lowest cell index. `centroids` is a fitted model ([(cell_id, vec, norm)]
    from `fit_kmeans_centroids` / `fit_centroids`).

    One narrow projection per row against compile-time literals: the same
    no-crossJoin / no-window shape as the IVF cosine assignment, so it holds
    at any corpus size."""
    cents = [list(c[1]) for c in centroids]
    ids = [c[0] for c in centroids]
    half_sq = [0.5 * _py_dot(c, c) for c in cents]
    affs = F.zip_with(
        centroid_dots(vec_col, cents),
        F.array(*[F.lit(h) for h in half_sq]),
        lambda d, h: d - h,
    )
    cell = F.element_at(
        F.array(*[F.lit(i) for i in ids]),
        F.array_position(affs, F.array_max(affs)).cast("int"),
    )
    return df.withColumn(out_col, cell)


def _py_kmeans_groups(
    cents: list[list[float]], n_super: int, n_iters: int = 10
) -> tuple[list[list[float]], list[list[int]]]:
    """Driver-side Lloyd's over the CENTROIDS themselves (the model is a few
    thousand rows at most — no Spark job needed). Deterministic: first
    n_super centroids seed, ties to the lowest super index, empty supers
    keep their previous mean. Returns (super_centroids, member cell indices
    per super, each list ascending)."""
    supers = [list(c) for c in cents[:n_super]]
    assign = [0] * len(cents)
    for _ in range(n_iters):
        for i, c in enumerate(cents):
            best, best_aff = 0, None
            for s, sc in enumerate(supers):
                aff = _py_dot(c, sc) - 0.5 * _py_dot(sc, sc)
                if best_aff is None or aff > best_aff:
                    best, best_aff = s, aff
            assign[i] = best
        for s in range(n_super):
            members = [cents[i] for i in range(len(cents)) if assign[i] == s]
            if members:
                supers[s] = [
                    sum(m[d] for m in members) / len(members) for d in range(len(cents[0]))
                ]
    groups = [[i for i in range(len(cents)) if assign[i] == s] for s in range(n_super)]
    return supers, groups


def two_level_assign(
    df: DataFrame,
    centroids: list[tuple],
    *,
    vec_col: str = "embedding",
    out_col: str = "cell",
    n_super: int | None = None,
) -> DataFrame:
    """Hierarchical nearest-centroid assignment — the >10^4-cells path the
    flat `kmeans_assign` docstrings promise: group the K centroids into
    ~√K super-cells (driver-side Lloyd's over the model itself), pick the
    nearest super-cell first (√K affinities), then the nearest member
    WITHIN it — O((√K + max_group)·d) flops per row instead of O(K·d),
    still ONE narrow projection (a CASE over super-cells: codegen evaluates
    only the matched branch per row), no join, no window, no Python.

    Approximation contract: exact whenever the true nearest centroid lives
    in the vector's nearest super-cell (always true for well-separated
    centroid groups; high-agreement otherwise — pinned by tests). Consumers
    that need exactness at moderate K stay on `kmeans_assign`; at the K
    where O(K·d) per row dominates, this is the standard IVF-HNSW-style
    coarse-then-fine trade.

    Cosine consumers: with a UNIT-centroid model (spherical k-means), every
    ½‖c‖² term is the constant ½, so argmax(v·c − ½) == argmax v·c — the
    same cell the cosine assignment picks — making this the drop-in
    hierarchical path for `semantic_dedup`-style quantizers too."""
    cents = [list(c[1]) for c in centroids]
    ids = [c[0] for c in centroids]
    k = len(cents)
    if n_super is None:
        n_super = max(1, int(round(k**0.5)))
    supers, groups = _py_kmeans_groups(cents, n_super)
    # drop empty supers (their branch could never be selected anyway, but
    # keeping them would waste affinity slots in the first-level fold)
    live = [(supers[s], groups[s]) for s in range(n_super) if groups[s]]
    sup_vecs = [sv for sv, _ in live]
    sup_half = [0.5 * _py_dot(sv, sv) for sv in sup_vecs]
    sup_affs = F.zip_with(
        centroid_dots(vec_col, sup_vecs),
        F.array(*[F.lit(h) for h in sup_half]),
        lambda d, h: d - h,
    )
    sup_pick = F.array_position(sup_affs, F.array_max(sup_affs))  # 1-based

    expr = None
    for s, (_, members) in enumerate(live):
        mem_vecs = [cents[i] for i in members]
        mem_half = [0.5 * _py_dot(v, v) for v in mem_vecs]
        mem_affs = F.zip_with(
            centroid_dots(vec_col, mem_vecs),
            F.array(*[F.lit(h) for h in mem_half]),
            lambda d, h: d - h,
        )
        mem_pick = F.element_at(
            F.array(*[F.lit(ids[i]) for i in members]),
            F.array_position(mem_affs, F.array_max(mem_affs)).cast("int"),
        )
        expr = (
            F.when(sup_pick == s + 1, mem_pick)
            if expr is None
            else expr.when(sup_pick == s + 1, mem_pick)
        )
    return df.withColumn(out_col, expr)


def _py_dot(a: list[float], b: list[float]) -> float:
    """Driver-side left fold in element order — the SAME IEEE-754 addition
    sequence as `_dot` / `_dot_sql` / DuckDB's list_dot_product, so norms and
    half-square-norms computed on the driver stay bitwise consistent with
    the distributed expressions (oracle hash-parity depends on this)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def fit_kmeans_centroids(
    emb: DataFrame,
    n_cells: int,
    *,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple]:
    """Distributed Lloyd's k-means: the PRODUCTION quantizer model for
    IVF/SemDeDup cell assignment (`fit_centroids` is the deterministic
    lowest-id placeholder; this is the "swap in k-means at production scale"
    path its docstring promises). Returns the same model shape —
    [(cell_idx, centroid_vec, norm)] — so `ivf_topk(..., centroids=...)` and
    every other consumer take it unchanged.

    Deterministic end to end: seeds are the n_cells lowest-id vectors, each
    iteration assigns every vector to the nearest centroid in squared
    Euclidean distance via the affinity identity
    argmin ||v−c||² == argmax (v·c − ½||c||²), ties to the lowest cell index,
    and empty cells keep their previous centroid (no RNG re-seeding — reruns
    and resumes produce the identical model).

    Scale shape (the part that must survive 10^12 rows): per iteration, ONE
    narrow projection computes all n_cells affinities from a compile-time
    centroid literal (`centroid_dots` — no crossJoin, no per-vector window)
    and ONE map-side-combining groupBy reduces to n_cells rows of
    (count, per-dimension sums); only those k·(dim+1) numbers reach the
    driver. dim sum-aggregates ride a single shuffle of pre-combined
    partials — the same plan MLlib's KMeans executes per step, without the
    RDD detour. Iterations are driver-sequenced like any Lloyd's
    implementation; n_iters is a small constant (loss is monotonically
    non-increasing, plateaus fast on real corpora)."""
    if n_cells < 1:
        raise ValueError("n_cells must be >= 1")
    seed_rows = emb.orderBy(id_col).limit(n_cells).select(F.col(vec_col).alias("v")).collect()
    if len(seed_rows) < n_cells:
        raise ValueError(
            f"corpus has only {len(seed_rows)} rows; cannot seed {n_cells} cells"
        )
    cents: list[list[float]] = [[float(x) for x in r["v"]] for r in seed_rows]
    dim = len(cents[0])

    base = emb.select(F.col(vec_col).alias("__v"))
    for _ in range(n_iters):
        assigned = kmeans_assign(
            base, [(c, cents[c], 0.0) for c in range(n_cells)], vec_col="__v", out_col="__cell"
        ).select("__cell", "__v")
        stats = (
            assigned.groupBy("__cell")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.sum(F.element_at("__v", i + 1)).alias(f"__s{i}") for i in range(dim)],
            )
            .collect()
        )
        by_cell = {r["__cell"]: r for r in stats}
        new_cents = []
        for c in range(n_cells):
            r = by_cell.get(c)
            if r is None:  # empty cell: keep the previous centroid
                new_cents.append(cents[c])
            else:
                n = r["__n"]
                new_cents.append([r[f"__s{i}"] / n for i in range(dim)])
        cents = new_cents

    import math

    return [(c, cents[c], math.sqrt(_py_dot(cents[c], cents[c]))) for c in range(n_cells)]


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple] | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into n_cells inverted
    lists, search only the n_probe closest cells per query.

    ``centroids`` is a pre-fit quantizer model from `fit_centroids` (pass it
    to amortize the model fit across queries); fit on the fly when omitted.
    Queries: (query_id, query_vec).

    Assignment plan (the 100 TB-critical part): the centroid model is a
    compile-time literal; every corpus vector computes all n_cells
    affinities in one projection (`centroid_dots`) and argmaxes with
    `array_position(affs, array_max(affs))` (ties → lowest index == lowest
    cent_id, matching the old window's DESC-aff/ASC-cent_id order). One row
    in, one row out, no crossJoin, no per-vector window shuffle. n_cells
    scaling contract: grow n_cells ∝ corpus size so cell size stays bounded;
    the assignment stays a single narrow projection at any n_cells — only
    the O(n_cells·d) fold grows, and `two_level_assign` (√K coarse pick,
    fine pick inside one CASE branch) cuts per-row flops to O(√K·d) when
    that dominates."""
    if centroids is None:
        centroids = fit_centroids(emb, n_cells, id_col=id_col, vec_col=vec_col)
    cent_ids = [c[0] for c in centroids]
    cent_vecs = [c[1] for c in centroids]
    cent_norms = [c[2] for c in centroids]
    id_lit = F.array(*[F.lit(i) for i in cent_ids])
    norm_lit = F.array(*[F.lit(x) for x in cent_norms])

    def _affs(vec_name: str, vnorm: Column) -> Column:
        # cosine per cell, same association as cosine_similarity: dot / (nv * nc)
        dots = centroid_dots(vec_name, cent_vecs)
        return F.zip_with(dots, norm_lit, lambda d, nc: d / (vnorm * nc))

    corpus_cells = (
        emb.select(
            F.col(id_col).alias("corpus_id"),
            F.col(vec_col).alias("corpus_vec"),
            _norm(F.col(vec_col)).alias("__vn"),
        )
        .withColumn("__affs", _affs("corpus_vec", F.col("__vn")))
        .select(
            "corpus_id",
            "corpus_vec",
            F.element_at(
                id_lit, F.array_position(F.col("__affs"), F.array_max("__affs")).cast("int")
            ).alias("cell"),
        )
    )
    # query probes: n_probe closest cells per query. Selected with an
    # array_sort + slice INSIDE the row (sort key struct(-aff, idx): ascending
    # -aff == descending aff, ties to the lower idx == lower cent_id — the
    # same order the old per-query window used) so the query side needs no
    # window shuffle at all; at production scale the query set is itself
    # large, and a per-query row_number would shuffle it.
    probe = F.slice(
        F.array_sort(
            F.zip_with(
                F.col("__affs"),
                F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                lambda a, i: F.struct((-a).alias("neg_aff"), i.alias("idx")),
            )
        ),
        1,
        n_probe,
    )
    query_cells = (
        queries.select(
            "query_id",
            "query_vec",
            _norm(F.col("query_vec")).alias("__vn"),
        )
        .withColumn("__affs", _affs("query_vec", F.col("__vn")))
        .select("query_id", "query_vec", F.explode(probe).alias("__p"))
        .select("query_id", "query_vec", F.element_at(id_lit, F.col("__p.idx") + 1).alias("cell"))
    )
    scored = corpus_cells.join(F.broadcast(query_cells), "cell").select(
        "query_id",
        F.col("corpus_id").alias("neighbor_id"),
        cosine_similarity(F.col("query_vec"), F.col("corpus_vec")).alias("cosine"),
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select("query_id", "neighbor_id", "rank", "cosine")


def fit_pq_codebooks(
    emb: DataFrame,
    *,
    m: int = 4,
    ksub: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple]]:
    """Product-quantization codebooks: split the d-dim space into `m`
    contiguous subspaces of d/m dims and fit an independent `ksub`-cell
    Lloyd's model per subspace (same deterministic recipe as
    `fit_kmeans_centroids`: lowest-id seeds, affinity argmax with
    lowest-cell ties, empty cells keep their centroid). Returns one model
    per subspace, each in the standard [(cell, centroid, norm)] shape.

    PQ is the memory path for embeddings at 10^12 rows: m log2(ksub)-bit
    codes replace 4·d bytes per vector (64-dim float32 → 4 bytes at
    m=4/ksub=256, a 64× compression), and the fit cost is m small k-means
    runs over subvector projections (each a narrow slice — column pruning
    means the scan reads the embedding column once per run)."""
    dim_row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:
        raise ValueError("empty corpus")
    dim = dim_row["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for s in range(m):
        sl = emb.select(
            F.col(id_col).alias(id_col),
            F.slice(F.col(vec_col), s * sub + 1, sub).alias("__sv"),
        )
        books.append(
            fit_kmeans_centroids(sl, ksub, n_iters=n_iters, id_col=id_col, vec_col="__sv")
        )
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[tuple]],
    *,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append `out_col`: array<int> of m PQ codes — per subspace, the index
    of the nearest sub-centroid in squared Euclidean distance (affinity
    identity argmin ||v−c||² == argmax (v·c − ½||c||²), ties to the lowest
    code). ONE narrow projection against compile-time codebook literals —
    the same no-crossJoin / no-window shape as `kmeans_assign`, m times in
    the same expression tree. One row in, one row out at any corpus size."""
    sub = len(codebooks[0][0][1])
    code_cols = []
    for s, book in enumerate(codebooks):
        cents = [list(c[1]) for c in book]
        half = [0.5 * _py_dot(c, c) for c in cents]
        sv = F.slice(F.col(vec_col), s * sub + 1, sub)
        affs = F.zip_with(
            centroid_dots(sv, cents),
            F.array(*[F.lit(h) for h in half]),
            lambda d, h: d - h,
        )
        code_cols.append((F.array_position(affs, F.array_max(affs)) - 1).cast("int"))
    return df.withColumn(out_col, F.array(*code_cols))


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebooks: list[list[tuple]],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k: encode the corpus to m-byte codes, then
    score every (query, code) pair with the ADC approximation
    dist²(q, v) ≈ Σ_s (||q_s||² − 2 q_s·c_{s,code_s} + ||c_{s,code_s}||²)
    and keep the k smallest per query (ties to the lowest neighbor id).
    Queries: (query_id, query_vec).

    Scale shape: the codebooks ride as literals; corpus rows carry only
    (id, m codes) into the scan — the full embedding column is needed once
    for encoding and never again (at production scale you'd persist the
    codes table and amortize encoding across every query batch). The query
    side broadcasts, so scoring is a broadcast nested-loop over compact
    codes — the sequential code-scan ADC is, by construction. Compose with
    IVF cells (`ivf_topk`'s assignment) to prune the scan to probed cells;
    per-query ranking is a bounded window over the scan output."""
    enc = pq_encode(emb, codebooks, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    sub = len(codebooks[0][0][1])
    cent_lit = F.array(
        *[F.array(*[F.lit(list(c[1])) for c in book]) for book in codebooks]
    )
    cnorm2_lit = F.array(
        *[F.array(*[F.lit(_py_dot(list(c[1]), list(c[1]))) for c in book]) for book in codebooks]
    )
    q = queries.select("query_id", "query_vec")
    joined = enc.crossJoin(F.broadcast(q))
    terms = []
    for s in range(len(codebooks)):
        qs = F.slice(F.col("query_vec"), s * sub + 1, sub)
        sel = F.element_at(F.element_at(cent_lit, s + 1), F.col("codes")[s] + 1)
        cn2 = F.element_at(F.element_at(cnorm2_lit, s + 1), F.col("codes")[s] + 1)
        terms.append(cn2 - F.lit(2.0) * _dot(qs, sel))
    dist = _dot(F.col("query_vec"), F.col("query_vec"))
    for t in terms:
        dist = dist + t
    scored = joined.select("query_id", "neighbor_id", dist.alias("adc_dist"))
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", "rank", "adc_dist"
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebooks: list[list[tuple]],
    centroids: list[tuple],
    *,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ: coarse-quantize the corpus into inverted lists (squared-
    Euclidean argmin against `centroids`, the same affinity identity as
    `kmeans_assign`), PQ-encode every vector, and answer queries by ADC
    scoring ONLY the codes in each query's `n_probe` closest cells — the
    production ANN layout where neither raw vectors nor the full code table
    are scanned per query.

    One corpus pass computes cell + codes in a single projection (both are
    literal folds); the scored relation is a broadcast join of query probes
    against the (cell-keyed) code table, so per-query work is
    |probed cells| · codes-per-cell, not |corpus|. Non-residual variant
    (codes encode raw vectors): the classic residual refinement changes only
    `pq_encode`'s input (v − centroid[cell]) and is orthogonal to the plan
    shape. Ranking ties break to the lowest neighbor id."""
    enc = pq_encode(
        kmeans_assign(emb, centroids, vec_col=vec_col, out_col="cell"),
        codebooks,
        vec_col=vec_col,
    ).select(F.col(id_col).alias("neighbor_id"), "cell", "codes")

    cent_ids = [c[0] for c in centroids]
    cent_vecs = [list(c[1]) for c in centroids]
    half_sq = [0.5 * _py_dot(c, c) for c in cent_vecs]
    id_lit = F.array(*[F.lit(i) for i in cent_ids])
    affs = F.zip_with(
        centroid_dots("query_vec", cent_vecs),
        F.array(*[F.lit(h) for h in half_sq]),
        lambda d, h: d - h,
    )
    probe = F.slice(
        F.array_sort(
            F.zip_with(
                affs,
                F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                lambda a, i: F.struct((-a).alias("neg_aff"), i.alias("idx")),
            )
        ),
        1,
        n_probe,
    )
    query_cells = (
        queries.select("query_id", "query_vec")
        .select("query_id", "query_vec", F.explode(probe).alias("__p"))
        .select(
            "query_id", "query_vec", F.element_at(id_lit, F.col("__p.idx") + 1).alias("cell")
        )
    )

    sub = len(codebooks[0][0][1])
    cent_lit = F.array(*[F.array(*[F.lit(list(c[1])) for c in book]) for book in codebooks])
    cnorm2_lit = F.array(
        *[F.array(*[F.lit(_py_dot(list(c[1]), list(c[1]))) for c in book]) for book in codebooks]
    )
    joined = enc.join(F.broadcast(query_cells), "cell")
    dist = _dot(F.col("query_vec"), F.col("query_vec"))
    for s in range(len(codebooks)):
        qs = F.slice(F.col("query_vec"), s * sub + 1, sub)
        sel = F.element_at(F.element_at(cent_lit, s + 1), F.col("codes")[s] + 1)
        cn2 = F.element_at(F.element_at(cnorm2_lit, s + 1), F.col("codes")[s] + 1)
        dist = dist + (cn2 - F.lit(2.0) * _dot(qs, sel))
    scored = joined.select("query_id", "neighbor_id", dist.alias("adc_dist"))
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", "rank", "adc_dist"
    )


def _residual_col(vec_col: str, centroids: list[tuple], cell_col: str = "cell") -> Column:
    """v − centroid[cell], elementwise, against the compile-time centroid
    matrix: select the row's centroid with array_position on the id literal
    (cells carry centroid IDs, not positions), then one zip_with. Row-local."""
    id_lit = F.array(*[F.lit(c[0]) for c in centroids])
    cent_lit = F.array(*[F.lit(list(c[1])) for c in centroids])
    sel = F.element_at(cent_lit, F.array_position(id_lit, F.col(cell_col)).cast("int"))
    return F.zip_with(F.col(vec_col), sel, lambda x, c: x - c)


def fit_residual_pq_codebooks(
    emb: DataFrame,
    centroids: list[tuple],
    *,
    m: int = 4,
    ksub: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple]]:
    """PQ codebooks fit on COARSE RESIDUALS (v − centroid[cell]) — the
    FAISS IVF-PQ recipe: residuals concentrate around 0 with far less
    variance than raw vectors, so the same ksub codes quantize them much
    more accurately. The residual projection is row-local (assignment +
    subtraction against literals); the fit is the same deterministic
    per-subspace Lloyd's as `fit_pq_codebooks`."""
    assigned = kmeans_assign(emb, centroids, vec_col=vec_col, out_col="__cell")
    residuals = assigned.select(
        F.col(id_col).alias(id_col), _residual_col(vec_col, centroids, "__cell").alias("__rv")
    )
    return fit_pq_codebooks(
        residuals, m=m, ksub=ksub, n_iters=n_iters, id_col=id_col, vec_col="__rv"
    )


def ivfpq_residual_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebooks: list[list[tuple]],
    centroids: list[tuple],
    *,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Residual IVF+PQ ADC: corpus codes quantize v − centroid[cell]; each
    (query, probed cell) pair scores against the residual target
    t = q − centroid[cell], so dist ≈ ||t||² + Σ_s (||c_s||² − 2 t_s·c_s).
    Same plan shape as `ivfpq_topk` (one corpus projection for cell+codes,
    broadcast probes onto the cell-keyed code table, bounded ranking window)
    — the residual subtraction rides inside the existing projections against
    centroid literals, adding zero joins and zero shuffles."""
    assigned = kmeans_assign(emb, centroids, vec_col=vec_col, out_col="cell")
    with_res = assigned.withColumn("__rv", _residual_col(vec_col, centroids, "cell"))
    enc = pq_encode(with_res, codebooks, vec_col="__rv").select(
        F.col(id_col).alias("neighbor_id"), "cell", "codes"
    )

    cent_ids = [c[0] for c in centroids]
    cent_vecs = [list(c[1]) for c in centroids]
    half_sq = [0.5 * _py_dot(c, c) for c in cent_vecs]
    id_lit = F.array(*[F.lit(i) for i in cent_ids])
    affs = F.zip_with(
        centroid_dots("query_vec", cent_vecs),
        F.array(*[F.lit(h) for h in half_sq]),
        lambda d, h: d - h,
    )
    probe = F.slice(
        F.array_sort(
            F.zip_with(
                affs,
                F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                lambda a, i: F.struct((-a).alias("neg_aff"), i.alias("idx")),
            )
        ),
        1,
        n_probe,
    )
    query_cells = (
        queries.select("query_id", "query_vec")
        .select("query_id", "query_vec", F.explode(probe).alias("__p"))
        .select(
            "query_id", "query_vec", F.element_at(id_lit, F.col("__p.idx") + 1).alias("cell")
        )
        .withColumn("__t", _residual_col("query_vec", centroids, "cell"))
    )

    sub = len(codebooks[0][0][1])
    cent_lit = F.array(*[F.array(*[F.lit(list(c[1])) for c in book]) for book in codebooks])
    cnorm2_lit = F.array(
        *[F.array(*[F.lit(_py_dot(list(c[1]), list(c[1]))) for c in book]) for book in codebooks]
    )
    joined = enc.join(F.broadcast(query_cells), "cell")
    dist = _dot(F.col("__t"), F.col("__t"))
    for s in range(len(codebooks)):
        ts = F.slice(F.col("__t"), s * sub + 1, sub)
        sel = F.element_at(F.element_at(cent_lit, s + 1), F.col("codes")[s] + 1)
        cn2 = F.element_at(F.element_at(cnorm2_lit, s + 1), F.col("codes")[s] + 1)
        dist = dist + (cn2 - F.lit(2.0) * _dot(ts, sel))
    scored = joined.select("query_id", "neighbor_id", dist.alias("adc_dist"))
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", "rank", "adc_dist"
    )


def pair_set_eval(truth: DataFrame, approx: DataFrame, keys=("id_a", "id_b")) -> DataFrame:
    """ONE row: (n_truth, n_approx, n_hit, recall, precision) — the
    self-measurement instrument for any approximate pair operator (banded
    LSH near-dup, SimHash buckets, candidate generation) against its exact
    counterpart on the same corpus sample. Production use: run the exact
    side on a small deterministic sample (operators/sampling) and the
    approximate side with production parameters — the recall estimate is
    the banding-miss rate, measured instead of assumed from the 1-(1-p^r)^b
    formula.

    Plan: both relations are projected to bare pair keys before the single
    full-outer join (16 B/row through the exchange at any scale), then one
    map-side-combining aggregate."""
    t = truth.select(*keys).withColumn("__t", F.lit(1))
    a = approx.select(*keys).withColumn("__a", F.lit(1))
    j = t.join(a, list(keys), "full_outer")
    n_truth = F.count("__t")
    n_approx = F.count("__a")
    # coalesce: sum over ZERO pairs is NULL, but an empty corpus has 0 hits
    # (recall/precision stay NULL via 0/0 — same as the SQL oracle)
    n_hit = F.coalesce(
        F.sum(
            F.when(F.col("__t").isNotNull() & F.col("__a").isNotNull(), 1).otherwise(0)
        ),
        F.lit(0),
    )
    return j.agg(
        n_truth.alias("n_truth"),
        n_approx.alias("n_approx"),
        n_hit.alias("n_hit"),
        # try_divide: an empty truth/approx side yields NULL, not an ANSI
        # divide-by-zero error
        F.round(F.try_divide(n_hit.cast("double"), n_truth), 6).alias("recall"),
        F.round(F.try_divide(n_hit.cast("double"), n_approx), 6).alias("precision"),
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    skip_top: int = 5,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    vectors ranked (skip_top, skip_top+k] by exact cosine — similar enough
    to be informative negatives, but outside the presumed-positive top
    `skip_top`. Returns (query_id, neighbor_id, rank, cosine), rank as in
    `brute_force_topk` (1-based over the whole corpus).

    Same scale shape as `brute_force_topk`: broadcast query side, one
    corpus scan, per-query rank window bounded by skip_top+k via the
    rank filter's pushdown into the window's TopK (Spark rewrites
    row_number ≤ const over a window into a per-partition heap).
    """
    ranked = brute_force_topk(
        corpus,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        k=int(skip_top) + int(k),
    )
    return ranked.filter(F.col("rank") > int(skip_top))
