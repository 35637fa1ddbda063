"""Distributed Lloyd's k-means (operators/simsearch.fit_kmeans_centroids):
blob-mean recovery, monotone inertia, deterministic reruns, empty-cell
keep-old semantics, and model compatibility with ivf_topk."""

from __future__ import annotations

import pytest

from jsonschema_spark.operators.simsearch import (
    fit_kmeans_centroids,
    ivf_topk,
    kmeans_assign,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _blobs(spark):
    # ids 0..9 near (1,0), ids 10..19 near (0,10): separated in BOTH
    # Euclidean distance (k-means cells) and angle (ivf_topk's cosine
    # probing); seeds (2 lowest ids) both start inside blob A — Lloyd's
    # must migrate one to blob B. No zero vectors (cosine divides by norm).
    a = [[1.0 + 0.01 * i, 0.01 * i] for i in range(10)]
    b = [[0.01 * i, 10.0 + 0.01 * i] for i in range(10)]
    return _emb_df(spark, a + b), a, b


def _mean(vs):
    n = len(vs)
    return [sum(v[i] for v in vs) / n for i in range(len(vs[0]))]


def _inertia(vecs, model):
    # squared-Euclidean distance to the nearest centroid, summed
    total = 0.0
    for v in vecs:
        total += min(
            sum((x - c) ** 2 for x, c in zip(v, cent)) for _, cent, _ in model
        )
    return total


def test_two_blobs_recover_means(spark):
    df, a, b = _blobs(spark)
    model = fit_kmeans_centroids(df, 2, n_iters=6)
    cents = sorted([c for _, c, _ in model], key=lambda c: c[1])  # A has y≈0, B y≈10
    assert cents[0] == pytest.approx(_mean(a), abs=1e-9)
    assert cents[1] == pytest.approx(_mean(b), abs=1e-9)


def test_inertia_non_increasing_and_deterministic(spark):
    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(120)]
    df = _emb_df(spark, vecs)
    prev = None
    for iters in (0, 1, 2, 4):
        model = fit_kmeans_centroids(df, 5, n_iters=iters)
        cur = _inertia(vecs, model)
        if prev is not None:
            assert cur <= prev + 1e-9
        prev = cur
    again = fit_kmeans_centroids(df, 5, n_iters=4)
    assert again == fit_kmeans_centroids(df, 5, n_iters=4)


def test_empty_cell_keeps_previous_centroid(spark):
    # duplicate seeds: ties go to the LOWEST cell, so cell 1 captures
    # nothing in iteration 1 (every point is equidistant or closer to cell
    # 0) and must keep its seed centroid verbatim
    vecs = [[0.0, 0.0], [0.0, 0.0], [2.0, 2.0], [4.0, 4.0]]
    df = _emb_df(spark, vecs)
    model = fit_kmeans_centroids(df, 2, n_iters=1)
    assert model[0][1] == pytest.approx([1.5, 1.5], abs=1e-12)  # mean of all 4
    assert model[1][1] == [0.0, 0.0]  # empty cell: seed retained


def test_tie_assignment_goes_to_lowest_cell(spark):
    vecs = [[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]]
    df = _emb_df(spark, vecs)
    model = [(0, [0.0, 0.0], 0.0), (1, [0.0, 0.0], 0.0)]
    cells = {r["vec_id"]: r["cell"] for r in kmeans_assign(df, model).collect()}
    assert set(cells.values()) == {0}


def test_kmeans_model_feeds_ivf(spark):
    df, a, b = _blobs(spark)
    model = fit_kmeans_centroids(df, 2, n_iters=2)
    queries = df.filter("vec_id IN (0, 10)").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    out = ivf_topk(df, queries, k=3, n_cells=2, n_probe=1, centroids=model)
    rows = out.collect()
    assert len(rows) == 6
    for r in rows:
        # with one probed cell per query, neighbors come from the query's blob
        same_blob = (r["query_id"] < 10) == (r["neighbor_id"] < 10)
        assert same_blob


def test_spherical_kmeans_unit_centroids_and_blob_directions(spark):
    import math

    from jsonschema_spark.operators.semdedup import (
        fit_spherical_kmeans_centroids,
        semantic_dedup,
    )

    # two angular blobs: around +x and around +y (unit-ish magnitudes vary;
    # spherical k-means must ignore magnitude and split by direction)
    a = [[5.0, 0.01 * i] for i in range(10)]
    b = [[0.01 * i, 3.0] for i in range(10)]
    df = _emb_df(spark, a + b)
    model = fit_spherical_kmeans_centroids(df, 2, n_iters=5)
    for _, c in model:
        assert math.sqrt(sum(x * x for x in c)) == pytest.approx(1.0, rel=1e-12)
    dirs = sorted([c for _, c in model], key=lambda c: c[1])  # x-blob first
    assert dirs[0][0] > 0.99  # ~ +x
    assert dirs[1][1] > 0.99  # ~ +y

    # model feeds semantic_dedup unchanged; parallel vectors in the same
    # cell (cosine 1.0) dedup against the lowest id
    out = semantic_dedup(df, threshold=0.999, centroids=model).collect()
    kept = {r["id"] for r in out if r["keep"]}
    assert 0 in kept and 10 in kept

    again = fit_spherical_kmeans_centroids(df, 2, n_iters=5)
    assert again == model


def test_two_level_assign_exact_on_separated_groups(spark):
    import random

    from jsonschema_spark.operators.simsearch import kmeans_assign, two_level_assign

    # 16 centroids in 4 well-separated groups of 4 -> the nearest centroid
    # always lives in the nearest super-cell, so two-level == flat exactly
    rng = random.Random(3)
    anchors = [[0.0, 0.0], [100.0, 0.0], [0.0, 100.0], [100.0, 100.0]]
    cents = []
    for a in anchors:
        for _ in range(4):
            cents.append([a[0] + rng.uniform(-1, 1), a[1] + rng.uniform(-1, 1)])
    model = [(i, c, 0.0) for i, c in enumerate(cents)]
    vecs = [
        [anchors[i % 4][0] + rng.uniform(-3, 3), anchors[i % 4][1] + rng.uniform(-3, 3)]
        for i in range(200)
    ]
    df = _emb_df(spark, vecs)
    flat = {r["vec_id"]: r["cell"] for r in kmeans_assign(df, model).collect()}
    two = {r["vec_id"]: r["cell"] for r in two_level_assign(df, model, n_super=4).collect()}
    assert two == flat

    # plan stays a single joinless, windowless, Python-free projection
    p = two_level_assign(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p and "Exchange" not in p and "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_two_level_assign_high_agreement_unstructured(spark):
    import random

    from jsonschema_spark.operators.simsearch import kmeans_assign, two_level_assign

    rng = random.Random(11)
    cents = [[rng.uniform(0, 10) for _ in range(4)] for _ in range(25)]
    model = [(i, c, 0.0) for i, c in enumerate(cents)]
    vecs = [[rng.uniform(0, 10) for _ in range(4)] for _ in range(400)]
    df = _emb_df(spark, vecs)
    flat = {r["vec_id"]: r["cell"] for r in kmeans_assign(df, model).collect()}
    two = {r["vec_id"]: r["cell"] for r in two_level_assign(df, model).collect()}
    agree = sum(flat[i] == two[i] for i in flat) / len(flat)
    assert agree >= 0.8, f"two-level agreement {agree:.2f} below documented floor"


def test_two_level_assign_degenerate_supers_equal_flat(spark):
    import random

    from jsonschema_spark.operators.simsearch import kmeans_assign, two_level_assign

    rng = random.Random(5)
    cents = [[rng.uniform(0, 10) for _ in range(3)] for _ in range(9)]
    model = [(i, c, 0.0) for i, c in enumerate(cents)]
    vecs = [[rng.uniform(0, 10) for _ in range(3)] for _ in range(60)]
    df = _emb_df(spark, vecs)
    flat = {r["vec_id"]: r["cell"] for r in kmeans_assign(df, model).collect()}
    # n_super=1: one super-cell containing every centroid -> the fine pick
    # IS the flat argmax
    one = {r["vec_id"]: r["cell"] for r in two_level_assign(df, model, n_super=1).collect()}
    assert one == flat
