"""Snapshot-diff incremental validation, interleaved-layout
canonicalization, and bucket-skew diagnostics (operators/snapshot.py,
operators/spans.canonicalize_spans)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)
DOCS = StructType(
    [StructField("doc_id", StringType()), StructField("spans", ArrayType(SPAN))]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS)


def _canon_md5(spans):
    parts = []
    for kind, text, ref, off in spans:
        f = lambda v: "\x11" if v is None else str(v)
        parts.append("\x1f".join([f(kind), f(text), f(ref), f(off)]))
    return hashlib.md5("\x1e".join(parts).encode()).hexdigest()


class TestCanonicalizeSpans:
    def test_merges_text_runs_and_rebuilds_offsets(self, spark):
        from jsonschema_spark.operators.spans import canonicalize_spans

        df = _docs(
            spark,
            [
                (
                    "d1",
                    [
                        ("text", "a b", None, 7),
                        ("text", "c", None, 3),
                        ("media", None, "m1", 9),
                        ("media", None, "m2", 1),
                        ("text", "d", None, 2),
                    ],
                )
            ],
        )
        [r] = canonicalize_spans(df).collect()
        got = [tuple(s) for s in r.spans]
        # 'a b'+'c' merge (cost 6); media atomic (cost 1 each); offsets are
        # the running linearized position.
        assert got == [
            ("text", "a b c", None, 0),
            ("media", None, "m1", 6),
            ("media", None, "m2", 7),
            ("text", "d", None, 8),
        ]

    def test_single_media_and_all_text(self, spark):
        from jsonschema_spark.operators.spans import canonicalize_spans

        df = _docs(
            spark,
            [
                ("m", [("media", None, "m3", 5)]),
                ("t", [("text", "x", None, 9), ("text", "y", None, 0)]),
            ],
        )
        out = {r.doc_id: [tuple(s) for s in r.spans] for r in canonicalize_spans(df).collect()}
        assert out["m"] == [("media", None, "m3", 0)]
        assert out["t"] == [("text", "x y", None, 0)]

    def test_empty_spans_array(self, spark):
        from jsonschema_spark.operators.spans import canonicalize_spans

        df = _docs(spark, [("e", [])])
        [r] = canonicalize_spans(df).collect()
        assert r.spans == []

    def test_idempotent(self, spark):
        from jsonschema_spark.operators.spans import canonicalize_spans

        df = _docs(
            spark,
            [
                (
                    "d",
                    [
                        ("text", "a", None, 0),
                        ("text", "b", None, 1),
                        ("media", None, "m", 2),
                        ("text", "c", None, 3),
                    ],
                )
            ],
        )
        once = canonicalize_spans(df)
        twice = canonicalize_spans(once)
        a = [tuple(s) for s in once.collect()[0].spans]
        b = [tuple(s) for s in twice.collect()[0].spans]
        assert a == b

    def test_preserves_other_columns(self, spark):
        from jsonschema_spark.operators.spans import canonicalize_spans

        df = _docs(spark, [("d", [("text", "a", None, 0)])]).withColumn(
            "extra", F.lit(42)
        )
        [r] = canonicalize_spans(df).collect()
        assert r.extra == 42

    def test_row_local_no_exchange(self, spark):
        from jsonschema_spark.operators.spans import canonicalize_spans

        df = _docs(spark, [("d", [("text", "a", None, 0)])])
        p = canonicalize_spans(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestContentDigest:
    def test_matches_reference_md5(self, spark):
        from jsonschema_spark.operators.snapshot import content_digest

        spans = [("text", "hello", None, 0), ("media", None, "m://1", 6)]
        df = _docs(spark, [("d", spans)])
        [r] = df.select(content_digest("spans").alias("dig")).collect()
        assert r.dig == _canon_md5(spans)

    def test_order_sensitive_and_offset_sensitive(self, spark):
        from jsonschema_spark.operators.snapshot import content_digest

        a = [("text", "x", None, 0), ("text", "y", None, 1)]
        b = [("text", "y", None, 1), ("text", "x", None, 0)]
        c = [("text", "x", None, 0), ("text", "y", None, 2)]
        df = _docs(spark, [("a", a), ("b", b), ("c", c)])
        digs = {
            r.doc_id: r.dig
            for r in df.select("doc_id", content_digest("spans").alias("dig")).collect()
        }
        assert len(set(digs.values())) == 3

    def test_null_spans_digest_is_null(self, spark):
        from jsonschema_spark.operators.snapshot import content_digest

        df = _docs(spark, [("n", None)])
        [r] = df.select(content_digest("spans").alias("dig")).collect()
        assert r.dig is None


class TestSnapshotDiffValidate:
    def _mono(self):
        offs = F.transform("spans", lambda s: s["offset"])
        return offs == F.array_sort(offs)

    def test_statuses_and_verdict_reuse(self, spark):
        from jsonschema_spark.operators.snapshot import (
            content_digest,
            snapshot_diff_validate,
        )

        cur = _docs(
            spark,
            [
                ("unchanged", [("text", "a", None, 0)]),
                ("changed", [("text", "b", None, 0)]),
                ("new", [("text", "c", None, 5), ("text", "d", None, 1)]),
            ],
        )
        base_rows = cur.filter(F.col("doc_id") != "new").select(
            "doc_id",
            F.when(
                F.col("doc_id") == "changed", F.lit("0" * 32)
            )
            .otherwise(content_digest("spans"))
            .alias("digest"),
            # stored verdict is deliberately FALSE: if the engine recomputed
            # instead of reusing, 'unchanged' would come back True.
            F.lit(False).alias("valid"),
        )
        out = {
            r.doc_id: (r.status, r.valid)
            for r in snapshot_diff_validate(cur, base_rows, self._mono()).collect()
        }
        assert out["unchanged"] == ("unchanged", False)  # reused stored bit
        assert out["changed"] == ("changed", True)  # re-evaluated: mono holds
        assert out["new"] == ("new", False)  # evaluated: offsets not sorted

    def test_output_is_next_manifest(self, spark):
        """Feeding the output back as `base` marks everything unchanged."""
        from jsonschema_spark.operators.snapshot import snapshot_diff_validate

        cur = _docs(
            spark,
            [("a", [("text", "x", None, 0)]), ("b", [("media", None, "m", 0)])],
        )
        first = snapshot_diff_validate(
            cur, cur.sparkSession.createDataFrame([], "doc_id string, digest string, valid boolean"), self._mono()
        )
        second = snapshot_diff_validate(cur, first.select("doc_id", "digest", "valid"), self._mono())
        statuses = {r.doc_id: r.status for r in second.collect()}
        assert statuses == {"a": "unchanged", "b": "unchanged"}

    def test_single_join_no_python(self, spark):
        from jsonschema_spark.operators.snapshot import snapshot_diff_validate

        cur = _docs(spark, [("a", [("text", "x", None, 0)])])
        base = spark.createDataFrame([], "doc_id string, digest string, valid boolean")
        p = (
            snapshot_diff_validate(cur, base, self._mono())
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert p.count("Join") <= 2  # one logical join (possibly split nodes)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestBucketSkewStats:
    def test_all_buckets_present_and_shares_sum(self, spark):
        from jsonschema_spark.operators.snapshot import bucket_skew_stats

        rows = [
            (f"doc{i}", [("text", "x" * (i + 1), None, 0), ("media", None, "m", 1)])
            for i in range(10)
        ]
        out = bucket_skew_stats(_docs(spark, rows), n_buckets=8).collect()
        assert [r.bucket for r in out] == list(range(8))
        assert sum(r.n_docs for r in out) == 10
        assert sum(r.n_spans for r in out) == 20
        assert sum(r.text_bytes for r in out) == sum(i + 1 for i in range(10))
        assert abs(sum(r.doc_share for r in out) - 1.0) < 1e-4

    def test_empty_bucket_rows_are_zero(self, spark):
        from jsonschema_spark.operators.snapshot import bucket_skew_stats

        out = bucket_skew_stats(
            _docs(spark, [("only", [("text", "a", None, 0)])]), n_buckets=4
        ).collect()
        assert len(out) == 4
        assert sum(r.n_docs for r in out) == 1
        zeros = [r for r in out if r.n_docs == 0]
        assert all(r.n_spans == 0 and r.text_bytes == 0 and r.doc_share == 0.0 for r in zeros)


class TestSnapshotChurn:
    def test_all_four_counters(self, spark):
        from pyspark.sql import functions as F

        from jsonschema_spark.operators.snapshot import (
            content_digest,
            snapshot_churn_stats,
        )

        def doc(i, txt):
            return (f"d{i}", [{"kind": "text", "text": txt, "media_ref": None, "offset": 0}])

        schema = (
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>"
        )
        cur = spark.createDataFrame(
            [doc(1, "same"), doc(2, "rewritten"), doc(3, "brand new")], schema
        )
        # base manifest: d1 unchanged, d2 with the OLD digest, d4 removed
        old = spark.createDataFrame(
            [doc(1, "same"), doc(2, "original"), doc(4, "gone")], schema
        )
        base = old.select("doc_id", content_digest(F.col("spans")).alias("digest"))
        row = snapshot_churn_stats(cur, base).collect()[0]
        assert (row["n_added"], row["n_removed"], row["n_changed"], row["n_unchanged"]) == (1, 1, 1, 1)

    def test_manifest_fixpoint_zero_churn(self, spark):
        from pyspark.sql import functions as F

        from jsonschema_spark.operators.snapshot import (
            content_digest,
            snapshot_churn_stats,
        )

        schema = (
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>"
        )
        cur = spark.createDataFrame(
            [("a", [{"kind": "media", "text": None, "media_ref": "m1", "offset": 0}])],
            schema,
        )
        base = cur.select("doc_id", content_digest(F.col("spans")).alias("digest"))
        row = snapshot_churn_stats(cur, base).collect()[0]
        assert (row["n_added"], row["n_removed"], row["n_changed"], row["n_unchanged"]) == (0, 0, 0, 1)
