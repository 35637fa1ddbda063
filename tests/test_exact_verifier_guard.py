"""The O(n^2) exact cosine verifier must refuse production-sized corpora:
it exists only to ground-truth the LSH path on samples (round-4 verdict
item 3)."""

from __future__ import annotations

import pytest

from jsonschema_spark import queries
from jsonschema_spark.queries import simsearch_reports


SF_DIR = "/root/testdata/sf0.001"


def test_exact_verifier_refuses_above_cap(spark, monkeypatch):
    monkeypatch.setattr(simsearch_reports, "EXACT_VERIFIER_MAX_ROWS", 3)
    with pytest.raises(ValueError, match="O\\(n\\^2\\) verifier"):
        queries.cosine_near_dup_exact(spark, SF_DIR)


def test_exact_verifier_runs_below_cap(spark):
    # default cap (50k) far above the fixture: the verifier still works
    df = queries.cosine_near_dup_exact(spark, SF_DIR)
    assert df.columns == ["id_a", "id_b", "cosine"]
    assert df.count() >= 0
