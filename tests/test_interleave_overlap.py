"""Span-interleaving stats, interleaved-aware packing cost, and KMV
cross-source overlap: semantics on crafted inputs + plan-shape gates."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
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
    [StructField("doc_id", LongType()), StructField("spans", ArrayType(SPAN))]
)


def _span(kind, text=None, ref=None, off=0):
    return (kind, text, ref, off)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestSpanInterleaveStats:
    def test_runs_and_counts(self, spark):
        from jsonschema_spark.operators.spans import span_interleave_stats

        rows = [
            # t m t m  -> 4 runs, 2 media
            (1, [_span("text", "a"), _span("media", None, "m1"),
                 _span("text", "b"), _span("media", None, "m2")]),
            # t t t -> 1 run, 0 media
            (2, [_span("text", "a"), _span("text", "b"), _span("text", "c")]),
            # m m t t -> 2 runs (block layout), same media_frac as doc 1
            (3, [_span("media", None, "m1"), _span("media", None, "m2"),
                 _span("text", "a"), _span("text", "b")]),
            # single span
            (4, [_span("media", None, "m1")]),
            # empty spans array
            (5, []),
        ]
        out = {
            r["doc_id"]: r
            for r in span_interleave_stats(
                spark.createDataFrame(rows, DOCS)
            ).collect()
        }
        assert (out[1]["n_spans"], out[1]["n_media"], out[1]["n_runs"]) == (4, 2, 4)
        assert out[1]["media_frac"] == 0.5
        assert (out[2]["n_runs"], out[2]["n_media"], out[2]["media_frac"]) == (1, 0, 0.0)
        # same composition, different layout: media_frac ties, n_runs separates
        assert out[3]["media_frac"] == out[1]["media_frac"]
        assert out[3]["n_runs"] == 2
        assert (out[4]["n_spans"], out[4]["n_runs"], out[4]["media_frac"]) == (1, 1, 1.0)
        assert (out[5]["n_spans"], out[5]["n_runs"]) == (0, 0)
        assert out[5]["media_frac"] is None

    def test_single_projection_no_shuffle_no_python(self, spark):
        from jsonschema_spark.operators.spans import span_interleave_stats

        df = spark.createDataFrame([(1, [_span("text", "a")])], DOCS)
        p = _plan(span_interleave_stats(df))
        assert "Exchange" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestSpanTransitionMatrix:
    def test_counts(self, spark):
        from jsonschema_spark.operators.spans import span_transition_matrix

        rows = [
            (1, [_span("text", "a"), _span("media", None, "m"), _span("text", "b")]),
            (2, [_span("text", "a"), _span("text", "b")]),
            (3, [_span("media", None, "m")]),  # no transitions
        ]
        out = {
            (r["from_kind"], r["to_kind"]): r["cnt"]
            for r in span_transition_matrix(
                spark.createDataFrame(rows, DOCS)
            ).collect()
        }
        assert out == {("text", "media"): 1, ("media", "text"): 1, ("text", "text"): 1}

    def test_one_aggregate_no_python(self, spark):
        from jsonschema_spark.operators.spans import span_transition_matrix

        df = spark.createDataFrame([(1, [_span("text", "a")])], DOCS)
        p = _plan(span_transition_matrix(df))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        # one shuffle: the bounded (from,to) groupBy
        assert p.count("Exchange") <= 1


class TestInterleavedTokenCost:
    def test_cost_arithmetic(self, spark):
        from jsonschema_spark.operators.packing import interleaved_token_cost

        rows = [
            (1, [_span("text", "one two three"), _span("media", None, "m")]),
            (2, [_span("media", None, "a"), _span("media", None, "b")]),
            (3, [_span("text", None)]),  # NULL text costs 0
            (4, [_span("text", "   ")]),  # whitespace-only costs 0
            (5, []),
        ]
        df = spark.createDataFrame(rows, DOCS)
        out = {
            r["doc_id"]: r["tokens"]
            for r in df.select(
                "doc_id",
                interleaved_token_cost("spans", media_token_cost=10).alias("tokens"),
            ).collect()
        }
        assert out == {1: 13, 2: 20, 3: 0, 4: 0, 5: 0}

    def test_row_local_no_shuffle(self, spark):
        from jsonschema_spark.operators.packing import interleaved_token_cost

        df = spark.createDataFrame([(1, [_span("text", "a")])], DOCS)
        p = _plan(df.select(interleaved_token_cost("spans").alias("t")))
        assert "Exchange" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestSourceOverlap:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, ["grp", "text"])

    def test_identical_corpora_estimate_one(self, spark):
        from jsonschema_spark.operators.overlap import source_overlap

        texts = [f"alpha beta gamma delta {i} epsilon zeta" for i in range(20)]
        rows = [("a", t) for t in texts] + [("b", t) for t in texts]
        out = source_overlap(
            self._docs(spark, rows), "grp", "text", k=32, shingle_n=3, buckets=4
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["src_a"], r["src_b"]) == ("a", "b")
        assert r["jaccard_est"] == 1.0
        assert r["n_union"] == r["n_both"] <= 32

    def test_disjoint_corpora_estimate_zero(self, spark):
        from jsonschema_spark.operators.overlap import source_overlap

        rows = [("a", f"red{i} green{i} blue{i} cyan{i}") for i in range(10)] + [
            ("b", f"one{i} two{i} three{i} four{i}") for i in range(10)
        ]
        r = source_overlap(
            self._docs(spark, rows), "grp", "text", k=32, shingle_n=3, buckets=4
        ).collect()[0]
        assert r["jaccard_est"] == 0.0 and r["n_both"] == 0

    def test_half_overlap_within_sketch_error(self, spark):
        from jsonschema_spark.operators.overlap import source_overlap

        shared = [f"common{i} word{i} here{i} now{i} ok{i}" for i in range(30)]
        only_a = [f"left{i} side{i} text{i} extra{i} pad{i}" for i in range(30)]
        only_b = [f"right{i} wing{i} prose{i} more{i} fill{i}" for i in range(30)]
        rows = [("a", t) for t in shared + only_a] + [("b", t) for t in shared + only_b]
        r = source_overlap(
            self._docs(spark, rows), "grp", "text", k=64, shingle_n=3, buckets=4
        ).collect()[0]
        # true Jaccard = |shared| / |union| = 1/3; KMV stderr ~ 1/sqrt(64)
        assert 0.33 - 0.25 <= r["jaccard_est"] <= 0.33 + 0.25

    def test_sketch_bounded_and_pairwise_complete(self, spark):
        from jsonschema_spark.operators.overlap import (
            source_overlap,
            source_sketches,
        )

        rows = [
            (f"g{g}", f"tok{g}a{i} tok{g}b{i} tok{g}c{i} shared{i} common{i}")
            for g in range(3)
            for i in range(15)
        ]
        df = self._docs(spark, rows)
        sk = source_sketches(df, "grp", "text", k=8, shingle_n=3, buckets=4)
        sizes = {r["grp"]: r["n"] for r in sk.groupBy("grp").agg(F.count("*").alias("n")).collect()}
        assert all(v <= 8 for v in sizes.values())
        out = source_overlap(df, "grp", "text", k=8, shingle_n=3, buckets=4)
        assert out.count() == 3  # C(3,2) pairs

    def test_no_python_and_pairs_broadcast(self, spark):
        from jsonschema_spark.operators.overlap import source_overlap

        df = self._docs(spark, [("a", "x y z w"), ("b", "x y z w")])
        p = _plan(source_overlap(df, "grp", "text", k=8, shingle_n=3, buckets=2))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        # the OR-membership pair join must broadcast the tiny pair relation,
        # never a shuffled product of sketch x sketch
        assert "CartesianProduct" not in p


class TestInterleavedTokenSet:
    def test_token_set_semantics(self, spark):
        from jsonschema_spark.operators.spans import interleaved_token_set

        rows = [
            (1, [_span("text", "a b c d"), _span("media", None, "img-1")]),
            # NULL text / NULL ref spans contribute nothing; duplicates collapse
            (2, [_span("text", None), _span("media", None, None),
                 _span("media", None, "img-1"), _span("media", None, "img-1")]),
            # short text (< n tokens) -> single joined shingle
            (3, [_span("text", "a b")]),
            (4, []),
        ]
        out = {
            r["doc_id"]: set(r["s"])
            for r in spark.createDataFrame(rows, DOCS)
            .select("doc_id", interleaved_token_set("spans").alias("s"))
            .collect()
        }
        assert out[1] == {"t:a b c", "t:b c d", "m:img-1"}
        assert out[2] == {"m:img-1"}
        assert out[3] == {"t:a b"}
        assert out[4] == set()

    def test_media_distinguishes_docs(self, spark):
        """Same prose, different attached media -> different signatures and
        sub-1.0 estimated Jaccard; identical interleaved docs -> a 1.0 pair."""
        from jsonschema_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_fold,
        )
        from jsonschema_spark.operators.spans import interleaved_token_set

        rows = [
            (1, [_span("text", "x"), _span("media", None, "a")]),
            (2, [_span("text", "x"), _span("media", None, "a")]),
            (3, [_span("text", "x"), _span("media", None, "b")]),
        ]
        sig = (
            spark.createDataFrame(rows, DOCS)
            .select(
                F.col("doc_id").alias("id"),
                minhash_fold(interleaved_token_set("spans"), 8).alias("sig"),
            )
        )
        sigs = {r["id"]: tuple(r["sig"]) for r in sig.collect()}
        assert sigs[1] == sigs[2]
        assert sigs[1] != sigs[3]
        pairs = {
            (r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in lsh_candidate_pairs(sig, bands=4, rows_per_band=2).collect()
        }
        assert pairs[(1, 2)] == 1.0
        for (a, b), est in pairs.items():
            if (a, b) != (1, 2):
                assert est < 1.0

    def test_plan_projection_only(self, spark):
        """Token set + signature is a pure projection: zero Exchange, no
        Python eval anywhere in the plan."""
        from jsonschema_spark.operators.dedup import minhash_fold
        from jsonschema_spark.operators.spans import interleaved_token_set

        rows = [(1, [_span("text", "a b c d"), _span("media", None, "m")])]
        df = spark.createDataFrame(rows, DOCS).select(
            "doc_id", minhash_fold(interleaved_token_set("spans"), 8).alias("sig")
        )
        plan = _plan(df)
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestMediaContextPairs:
    def _doc(self, spark, spans):
        from pyspark.sql.types import (
            ArrayType, IntegerType, StringType, StructField, StructType,
        )
        schema = StructType([
            StructField("doc_id", StringType()),
            StructField("spans", ArrayType(StructType([
                StructField("kind", StringType()),
                StructField("text", StringType()),
                StructField("media_ref", StringType()),
                StructField("offset", IntegerType()),
            ]))),
        ])
        return spark.createDataFrame([("d", spans)], schema)

    def test_nearest_nonnull_text_each_side(self, spark):
        from jsonschema_spark.operators.spans import media_context_pairs

        spans = [
            ("media", None, "m0", 0),           # media-first: no before
            ("text", "alpha", None, 1),
            ("text", None, None, 2),            # null text is skipped over
            ("media", None, "m1", 3),
            ("media", None, "m2", 4),           # consecutive media share context
            ("text", "omega", None, 5),
        ]
        rows = {r["media_ref"]: r for r in
                media_context_pairs(self._doc(spark, spans)).collect()}
        assert rows["m0"]["text_before"] is None
        assert rows["m0"]["text_after"] == "alpha"
        assert rows["m1"]["text_before"] == "alpha"   # skips the null text span
        assert rows["m1"]["text_after"] == "omega"
        assert rows["m2"]["text_before"] == "alpha"
        assert rows["m2"]["text_after"] == "omega"
        assert [rows[m]["pos"] for m in ("m0", "m1", "m2")] == [1, 4, 5]

    def test_no_media_emits_nothing_and_plan_stays_jvm(self, spark):
        from jsonschema_spark.operators.spans import media_context_pairs

        out = media_context_pairs(
            self._doc(spark, [("text", "only prose", None, 0)])
        )
        assert out.count() == 0
        p = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "Exchange" not in p  # row-local + explode: no shuffle at all


class TestMediaRefStats:
    def test_counts_and_flag(self, spark):
        from jsonschema_spark.operators.spans import media_ref_stats
        from pyspark.sql import functions as F

        # logo appears in 3 docs (twice in d1), content once
        rows = [
            ("d1", ["logo", "logo", "pic1"]),
            ("d2", ["logo"]),
            ("d3", ["logo", "pic2"]),
        ]
        docs = spark.createDataFrame(rows, "doc_id string, refs array<string>").select(
            "doc_id",
            F.transform(
                "refs",
                lambda r: F.struct(
                    F.lit("media").alias("kind"),
                    F.lit(None).cast("string").alias("text"),
                    r.alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
            ).alias("spans"),
        )
        got = {r["media_ref"]: r for r in media_ref_stats(docs, max_docs=2).collect()}
        assert got["logo"]["n_docs"] == 3 and got["logo"]["n_occurrences"] == 4
        assert got["logo"]["flagged"] is True
        assert got["pic1"]["n_docs"] == 1 and got["pic1"]["flagged"] is False


class TestInterleavedDocFilter:
    def test_rules_and_keep(self, spark):
        from jsonschema_spark.operators.spans import interleaved_doc_filter
        from pyspark.sql import functions as F

        def doc(i, n_text, n_media, text):
            spans = [
                {"kind": "text", "text": text, "media_ref": None, "offset": j}
                for j in range(n_text)
            ] + [
                {"kind": "media", "text": None, "media_ref": f"m{j}", "offset": 100 + j}
                for j in range(n_media)
            ]
            return (f"d{i}", spans)

        schema = (
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>"
        )
        df = spark.createDataFrame(
            [
                doc(1, 8, 2, "x" * 50),    # keep: 400 chars, 0.2 frac, 2 media
                doc(2, 2, 8, "x" * 200),   # media-heavy (0.8) but enough text
                doc(3, 8, 2, "x" * 10),    # too little text (80 chars)
                doc(4, 40, 35, "x" * 20),  # too many media (35 > 30)
            ],
            schema,
        )
        rows = {r["doc_id"]: r for r in interleaved_doc_filter(
            df, max_media=30, max_media_frac=0.5, min_text_chars=200
        ).collect()}
        assert rows["d1"]["keep"] is True
        assert rows["d2"]["r_media_heavy"] is True and rows["d2"]["keep"] is False
        assert rows["d3"]["r_too_little_text"] is True
        assert rows["d4"]["r_too_many_media"] is True
        p = interleaved_doc_filter(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p and "ArrowEvalPython" not in p


class TestSpanLangConsistency:
    def test_mixture_and_vote_tiebreaks(self, spark):
        from jsonschema_spark.operators.spans import span_lang_consistency

        schema = (
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>"
        )

        def tsp(text, off=0):
            return {"kind": "text", "text": text, "media_ref": None, "offset": off}

        def msp(off=0):
            return {"kind": "media", "text": None, "media_ref": "m", "offset": off}

        df = spark.createDataFrame(
            [
                ("pure", [tsp("the cat and the dog of the house"), msp(1)]),
                ("mixed", [tsp("the cat and the dog"), tsp("der hund und die katze ist", 1)]),
                ("und", [tsp("zzz qqq www"), msp(1)]),
                # one en span, one de span, one es span: vote tie of 1 each
                # -> lexicographically largest language wins (es)
                ("tie", [tsp("the and of"), tsp("der und das", 1), tsp("el los y", 2)]),
            ],
            schema,
        )
        rows = {r["doc_id"]: r for r in span_lang_consistency(df).collect()}
        assert rows["pure"]["mixed"] is False and rows["pure"]["majority_lang"] == "en"
        assert rows["mixed"]["mixed"] is True and rows["mixed"]["n_langs"] == 2
        assert rows["und"]["n_text_spans"] == 1 and rows["und"]["n_lang_spans"] == 0
        assert rows["und"]["majority_lang"] is None and rows["und"]["mixed"] is False
        assert rows["tie"]["majority_lang"] == "es"  # count tie -> largest lang
        p = span_lang_consistency(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p and "ArrowEvalPython" not in p
