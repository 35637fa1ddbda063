"""SemDeDup-style semantic dedup (operators/semdedup.py)."""

from __future__ import annotations

import pytest

from jsonschema_spark.operators.semdedup import semantic_dedup


@pytest.fixture()
def emb(spark):
    # two tight groups on orthogonal axes + one isolated vector; ids chosen
    # so the two centroids (lowest ids, n_cells=2) are one per group
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.999, 0.01, 0.0]),   # near-dup of 1
        (4, [0.0, 0.998, 0.02]),   # near-dup of 2
        (5, [2.0, 0.0, 0.0]),      # scaled exact dup of 1 (cosine 1.0)
        (6, [0.7, 0.7, 0.1]),      # between groups, near neither (cos<0.95 after norm? ~0.707)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_drop_rule_keeps_lowest_id(spark, emb):
    out = {r["id"]: r for r in semantic_dedup(emb, threshold=0.95, n_cells=2).collect()}
    assert out[1]["keep"] is True           # lowest id in its cell
    assert out[2]["keep"] is True
    assert out[3]["keep"] is False          # near-dup of lower-id 1
    assert out[4]["keep"] is False          # near-dup of lower-id 2
    assert out[5]["keep"] is False          # scaled copy: cosine exactly 1.0
    assert out[5]["nn_lower_cosine"] == pytest.approx(1.0)
    assert out[6]["keep"] is True           # ~45 degrees from both axes
    assert len(out) == 6                    # one verdict row per input


def test_comparisons_stay_within_cells(spark, emb):
    # with every vector its own centroid, near-dups (3, 4) sit alone in
    # their own cells and survive even at a low threshold — only the scaled
    # EXACT dup (5) ties at cosine 1.0 with centroid 1 (tie-break: lower
    # cent_id) and is compared + dropped
    out = {r["id"]: r for r in semantic_dedup(emb, threshold=0.5, n_cells=6).collect()}
    assert [out[i]["keep"] for i in (1, 2, 3, 4, 6)] == [True] * 5
    assert out[5]["keep"] is False


def test_threshold_boundary_uses_rounded_cosine(spark):
    # two identical vectors: rounded cosine 1.0 >= any threshold < 1.0
    df = spark.createDataFrame(
        [(1, [0.6, 0.8]), (2, [0.6, 0.8])], "vec_id long, embedding array<float>"
    )
    out = {r["id"]: r for r in semantic_dedup(df, threshold=0.999999, n_cells=1).collect()}
    assert out[1]["keep"] is True and out[2]["keep"] is False
