"""Banded hyperplane LSH: recall against the exact verifier, and plan shape.

The LSH path must find (nearly) every pair the exact O(n²) verifier finds —
this pins the OR-construction's recall at a fixed threshold so bucketing
regressions show up as test failures, not silent quality loss."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.simsearch import (
    ann_topk,
    band_keys,
    brute_force_topk,
    cosine_near_dup_pairs,
    hyperplane_projections,
    infer_dim,
)

DIM = 32


def _unit(rng: random.Random) -> list[float]:
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _perturb(v: list[float], rng: random.Random, eps: float) -> list[float]:
    w = [x + rng.gauss(0, eps) for x in v]
    n = math.sqrt(sum(x * x for x in w))
    return [x / n for x in w]


@pytest.fixture(scope="module")
def planted(spark):
    """60 random unit vectors + 12 planted near-duplicates (cos ≳ 0.99)."""
    rng = random.Random(7)
    rows = []
    for i in range(60):
        rows.append((i, _unit(rng)))
    for j in range(12):
        base = rows[j][1]
        rows.append((100 + j, _perturb(base, rng, 0.02)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _exact_pairs(df, threshold):
    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .collect()
    }


def test_near_dup_lsh_recall_vs_exact(spark, planted):
    exact = _exact_pairs(planted, 0.95)
    assert len(exact) >= 12  # every planted pair is a true near-dup
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(planted, threshold=0.95).collect()
    }
    # no false positives (exact verification) and >= 90% recall
    assert got <= exact
    assert len(got) >= 0.9 * len(exact), (len(got), len(exact))


def test_ann_topk_recall_vs_brute_force(spark, planted):
    queries = planted.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(planted, queries, k=3).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk(planted, queries, k=3, bands=8, rows_per_band=4).collect()
    }
    assert len(got & exact) >= 0.7 * len(exact), (got, exact)


def test_near_dup_numpy_verifier_matches_jvm(spark, planted):
    jvm = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(planted, threshold=0.95).collect()
    }
    np_ = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(planted, threshold=0.95, dot_method="numpy").collect()
    }
    assert jvm == np_


def test_projections_single_pass_and_dimension_guard(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * DIM), (2, [1.0] * (DIM + 3))], "id long, v array<double>"
    )
    out = df.select(
        "id", hyperplane_projections(F.col("v"), 8, infer_dim(df, "v")).alias("p")
    ).collect()
    by_id = {r["id"]: r["p"] for r in out}
    assert len(by_id[1]) == 8
    assert by_id[2] is None  # wrong-dimension vectors yield NULL, never truncate


def test_band_keys_bucket_domain(spark):
    df = spark.createDataFrame([(1, [0.5, -0.5, 1.0, -1.0] * 8)], "id long, v array<double>")
    keys = df.select(
        band_keys(hyperplane_projections(F.col("v"), 16, 32), 4, 4).alias("k")
    ).first()["k"]
    assert len(keys) == 4
    assert all(0 <= k < 16 for k in keys)  # 2^rows_per_band buckets per band
