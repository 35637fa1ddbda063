"""Product quantization (operators/simsearch.fit_pq_codebooks / pq_encode /
pq_topk): model shape, encoding determinism, ADC sanity on separated
clusters, and the plan gates (encode = one projection; scoring broadcasts
the query side)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.simsearch import (
    fit_pq_codebooks,
    pq_encode,
    pq_topk,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _clustered(spark):
    # two well-separated groups in 8 dims: ids 0-4 near +1, ids 5-9 near -1
    rows = []
    for i in range(10):
        base = 1.0 if i < 5 else -1.0
        rows.append((i, [base + 0.01 * ((i * 7 + d) % 5) for d in range(8)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_fit_shapes_and_determinism(spark):
    emb = _clustered(spark)
    books = fit_pq_codebooks(emb, m=2, ksub=2, n_iters=2)
    again = fit_pq_codebooks(emb, m=2, ksub=2, n_iters=2)
    assert len(books) == 2 and all(len(b) == 2 for b in books)
    assert all(len(c[1]) == 4 for b in books for c in b)  # 8 dims / m=2
    assert [[c[1] for c in b] for b in books] == [[c[1] for c in b] for b in again]


def test_encode_separates_clusters(spark):
    emb = _clustered(spark)
    books = fit_pq_codebooks(emb, m=2, ksub=2, n_iters=2)
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    # within-group codes agree, across-group codes differ (clusters are separated)
    assert len({tuple(codes[i]) for i in range(5)}) == 1
    assert len({tuple(codes[i]) for i in range(5, 10)}) == 1
    assert codes[0] != codes[9]


def test_adc_topk_prefers_own_cluster(spark):
    emb = _clustered(spark)
    books = fit_pq_codebooks(emb, m=2, ksub=2, n_iters=2)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = pq_topk(emb, q, books, k=5).collect()
    assert sorted(r["neighbor_id"] for r in top) == [0, 1, 2, 3, 4]
    assert all(r["adc_dist"] < 1.0 for r in top)


def test_fit_rejects_indivisible_dim(spark):
    emb = _clustered(spark)
    with pytest.raises(ValueError):
        fit_pq_codebooks(emb, m=3, ksub=2)


def test_encode_plan_is_projection_no_python(spark):
    emb = _clustered(spark)
    books = fit_pq_codebooks(emb, m=2, ksub=2, n_iters=1)
    p = _plan(pq_encode(emb, books))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p and "Join" not in p, "encode must stay one narrow projection"


def test_topk_plan_broadcasts_queries(spark):
    emb = _clustered(spark)
    books = fit_pq_codebooks(emb, m=2, ksub=2, n_iters=1)
    q = emb.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    p = _plan(pq_topk(emb, q, books, k=3))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_ivfpq_prunes_to_probed_cells_and_finds_cluster(spark):
    from jsonschema_spark.operators.simsearch import fit_centroids, ivfpq_topk

    emb = _clustered(spark)
    books = fit_pq_codebooks(emb, m=2, ksub=2, n_iters=1)
    cents = fit_centroids(emb, 2, id_col="vec_id", vec_col="embedding")
    q = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = ivfpq_topk(emb, q, books, cents, k=3, n_probe=1).collect()
    # probing ONE cell still finds the query's own (negative) cluster
    assert all(r["neighbor_id"] >= 5 for r in top)
    assert len(top) == 3


def test_ivfpq_plan_broadcasts_probes_no_python(spark):
    from jsonschema_spark.operators.simsearch import fit_centroids, ivfpq_topk

    emb = _clustered(spark)
    books = fit_pq_codebooks(emb, m=2, ksub=2, n_iters=1)
    cents = fit_centroids(emb, 2, id_col="vec_id", vec_col="embedding")
    q = emb.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    p = _plan(ivfpq_topk(emb, q, books, cents, k=3, n_probe=1))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastHashJoin" in p, "query probes must broadcast onto the code table"
    assert "CartesianProduct" not in p


def test_ivfpq_residual_self_is_top1_with_tight_adc(spark):
    from jsonschema_spark.operators.simsearch import (
        fit_centroids,
        fit_residual_pq_codebooks,
        ivfpq_residual_topk,
    )

    emb = _clustered(spark)
    cents = fit_centroids(emb, 2, id_col="vec_id", vec_col="embedding")
    rbooks = fit_residual_pq_codebooks(emb, cents, m=2, ksub=2, n_iters=2)
    q = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = ivfpq_residual_topk(emb, q, rbooks, cents, k=5, n_probe=1).collect()
    by_rank = {r["rank"]: r for r in res}
    by_id = {r["neighbor_id"]: r for r in res}
    # ADC can't distinguish same-code cluster members: self must carry the
    # minimal ADC distance (possibly tied, ties break to lower ids)
    # ADC can't distinguish same-code cluster members, so the pins are:
    # self is retrieved, and it carries the minimal ADC distance (possibly
    # tied — ties break to lower ids). NB the lowest-id coarse placeholder
    # puts both centroids in the positive cluster here, so cells do NOT
    # align with the true clusters — irrelevant for these invariants.
    # ("residual beats raw PQ" is an in-expectation property of realistic
    # data, not a per-point invariant on a 10-row toy — not pinned.)
    assert 3 in by_id, "self must be retrieved"
    assert abs(by_id[3]["adc_dist"] - by_rank[1]["adc_dist"]) < 1e-9
    assert by_id[3]["adc_dist"] < 0.05, "residual codes must reconstruct self tightly"


def test_ivfpq_residual_plan_no_python(spark):
    from jsonschema_spark.operators.simsearch import (
        fit_centroids,
        fit_residual_pq_codebooks,
        ivfpq_residual_topk,
    )

    emb = _clustered(spark)
    cents = fit_centroids(emb, 2, id_col="vec_id", vec_col="embedding")
    rbooks = fit_residual_pq_codebooks(emb, cents, m=2, ksub=2, n_iters=1)
    q = emb.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    p = _plan(ivfpq_residual_topk(emb, q, rbooks, cents, k=3, n_probe=1))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
