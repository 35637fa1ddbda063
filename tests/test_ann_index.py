"""ANN index persistence / resume: model roundtrip fidelity, identical query
results through the persisted artifact, and the build-once/load-forever
resume contract."""

from __future__ import annotations

import math

import pytest


def _corpus(spark, n=40, dim=8):
    rows = [
        (i, [math.sin(0.7 * i + j) for j in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _queries(spark, dim=8):
    rows = [(100 + q, [math.cos(0.3 * q + j) for j in range(dim)]) for q in range(3)]
    return spark.createDataFrame(rows, "query_id long, query_vec array<double>")


def test_roundtrip_models_identical(spark, tmp_path):
    from jsonschema_spark.operators.ann_index import load_ann_index, save_ann_index
    from jsonschema_spark.operators.simsearch import fit_centroids, fit_pq_codebooks

    emb = _corpus(spark)
    cents = fit_centroids(emb, 4)
    books = fit_pq_codebooks(emb, m=2, ksub=4, n_iters=1)
    save_ann_index(
        spark, str(tmp_path / "ix"), centroids=cents, codebooks=books,
        params={"n_cells": 4, "m": 2, "ksub": 4},
    )
    ix = load_ann_index(spark, str(tmp_path / "ix"))
    assert ix["meta"]["params"]["n_cells"] == 4
    assert ix["centroids"] == [(c[0], [float(x) for x in c[1]], float(c[2])) for c in cents]
    assert len(ix["codebooks"]) == 2 and len(ix["codebooks"][0]) == 4
    for got, want in zip(ix["codebooks"], books):
        assert got == [(c[0], [float(x) for x in c[1]], float(c[2])) for c in want]


def test_query_results_identical_through_persisted_index(spark, tmp_path):
    from jsonschema_spark.operators.ann_index import load_ann_index, save_ann_index
    from jsonschema_spark.operators.simsearch import (
        fit_centroids,
        fit_pq_codebooks,
        ivfpq_topk,
    )

    emb, qs = _corpus(spark), _queries(spark)
    cents = fit_centroids(emb, 4)
    books = fit_pq_codebooks(emb, m=2, ksub=4, n_iters=1)
    direct = sorted(
        map(tuple, ivfpq_topk(emb, qs, k=3, n_probe=2, centroids=cents, codebooks=books).collect())
    )
    save_ann_index(spark, str(tmp_path / "ix"), centroids=cents, codebooks=books)
    ix = load_ann_index(spark, str(tmp_path / "ix"))
    via_index = sorted(
        map(
            tuple,
            ivfpq_topk(
                emb, qs, k=3, n_probe=2, centroids=ix["centroids"], codebooks=ix["codebooks"]
            ).collect(),
        )
    )
    assert via_index == direct


def test_build_or_load_resume_skips_build(spark, tmp_path):
    from jsonschema_spark.operators.ann_index import build_or_load_ann_index
    from jsonschema_spark.operators.simsearch import fit_centroids

    emb = _corpus(spark)
    calls = []

    def build():
        calls.append(1)
        return {"centroids": fit_centroids(emb, 4), "params": {"n_cells": 4}}

    first = build_or_load_ann_index(spark, str(tmp_path / "ix"), build)
    second = build_or_load_ann_index(spark, str(tmp_path / "ix"), build)
    assert len(calls) == 1  # resume did NOT rebuild
    assert second["centroids"] == first["centroids"]


def test_uncommitted_build_is_retried(spark, tmp_path):
    """A crash before the meta stamp leaves artifacts but no commit — the
    next build_or_load must rebuild, not load half-written state."""
    import os

    from jsonschema_spark.operators.ann_index import (
        build_or_load_ann_index,
        load_ann_index,
        save_ann_index,
    )
    from jsonschema_spark.operators.simsearch import fit_centroids

    emb = _corpus(spark)
    path = str(tmp_path / "ix")
    save_ann_index(spark, path, centroids=fit_centroids(emb, 4))
    os.remove(os.path.join(path, "meta.json"))  # simulate crash pre-commit

    with pytest.raises(FileNotFoundError):
        load_ann_index(spark, path)

    calls = []

    def build():
        calls.append(1)
        return {"centroids": fit_centroids(emb, 4)}

    build_or_load_ann_index(spark, path, build)
    assert len(calls) == 1  # rebuilt


def test_codes_roundtrip_lazy(spark, tmp_path):
    from jsonschema_spark.operators.ann_index import load_ann_index, save_ann_index
    from jsonschema_spark.operators.simsearch import fit_pq_codebooks, pq_encode

    emb = _corpus(spark)
    books = fit_pq_codebooks(emb, m=2, ksub=4, n_iters=1)
    codes = pq_encode(emb.select("vec_id", "embedding"), books).select("vec_id", "codes")
    save_ann_index(spark, str(tmp_path / "ix"), codebooks=books, codes=codes)
    ix = load_ann_index(spark, str(tmp_path / "ix"))
    got = {r["vec_id"]: list(r["codes"]) for r in ix["codes"].collect()}
    want = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert got == want
