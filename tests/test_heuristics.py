"""C4 line-filter and Gopher quality-rule semantics, plus HTML stripping —
pinned edge cases and plan gates (pure projections: no shuffle, no Python)."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id bigint, text string")


class TestC4:
    def test_line_and_doc_rules(self, spark):
        from jsonschema_spark.operators.heuristics import c4_line_filter

        rows = [
            # 3 proper sentences on kept lines -> keep
            (1, "This is a fine first sentence here.\nshort.\nno terminal punct line\n"
                "Another long and proper line ends right here! Final sentence closes the doc."),
            # lorem ipsum marker -> drop even though lines are fine
            (2, "This is a fine first sentence right here.\nlorem ipsum dolor sit amet consectetur."),
            # curly brace -> drop
            (3, "A good long sentence that would otherwise be kept. And one more. { code }"),
            # too few sentences after line filtering -> drop
            (4, "word word word\nword word"),
        ]
        out = {r["id"]: r for r in c4_line_filter(_docs(spark, rows), "id", "text").collect()}

        assert out[1]["keep"] is True
        # "short." has <5 words, bare line has no terminal punct -> both dropped
        assert out[1]["n_lines"] == 4 and out[1]["n_lines_kept"] == 2
        assert out[1]["n_sentences"] == 3
        assert "short." not in out[1]["text"]

        assert out[2]["keep"] is False  # lorem ipsum doc rule
        assert out[3]["keep"] is False  # curly-brace doc rule
        assert out[4]["keep"] is False and out[4]["n_lines_kept"] == 0
        assert out[4]["text"] == ""

    def test_plan_is_pure_projection(self, spark):
        from jsonschema_spark.operators.heuristics import c4_line_filter

        p = _plan(c4_line_filter(_docs(spark, [(1, "x.")]), "id", "text"))
        assert "Exchange" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestGopher:
    def _one(self, spark, text, **kw):
        from jsonschema_spark.operators.heuristics import gopher_quality

        return gopher_quality(_docs(spark, [(1, text)]), "id", "text", **kw).collect()[0]

    def test_good_doc_keeps(self, spark):
        base = "the quick brown fox jumps over and over with that lazy dog of note to be sure "
        r = self._one(spark, base * 5)  # 85 words, all alpha, stopword-rich
        assert r["keep"] is True
        assert r["n_words"] == 85
        assert r["stop_hits"] >= 2
        assert r["alpha_frac"] == 1.0

    def test_word_count_bounds(self, spark):
        r = self._one(spark, "only four words here")
        assert r["keep"] is False and r["n_words"] == 4

    def test_symbol_ratio_trips(self, spark):
        base = "the and of that with have to be words more words again yet again " * 5
        r = self._one(spark, base + "# " * 20)
        assert r["symbol_ratio"] > 0.1 and r["keep"] is False

    def test_ellipsis_counts_both_forms(self, spark):
        base = ("the and of that with have normal words going on here longer still " * 5).strip()
        r = self._one(spark, base + " so...\nand then…")
        # 1 ascii + 1 unicode ellipsis
        assert abs(r["symbol_ratio"] - 2 / r["n_words"]) < 1e-6

    def test_bullet_fraction_trips(self, spark):
        base = "the and of that with have words enough to pass the rest of rules here now " * 4
        r = self._one(spark, base + ("\n- item" * 30))
        assert r["bullet_frac"] > 0.9 and r["keep"] is False

    def test_stopword_rule(self, spark):
        # 60 words, zero required stopwords
        r = self._one(spark, "alpha beta gamma delta epsilon zeta " * 10)
        assert r["stop_hits"] == 0 and r["keep"] is False

    def test_plan_is_pure_projection(self, spark):
        from jsonschema_spark.operators.heuristics import gopher_quality

        p = _plan(gopher_quality(_docs(spark, [(1, "x")]), "id", "text"))
        assert "Exchange" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestStripHtml:
    def test_strips_blocks_tags_entities(self, spark):
        from jsonschema_spark.operators.text import strip_html

        html = (
            '<html><head><STYLE>p { x }</STYLE><script a="b">if (1 < 2) { y = "</p>"; }</script>'
            "</head><body><!-- note --><p>Hello <b>world</b></p>"
            "<div>Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>"
        )
        r = strip_html(_docs(spark, [(1, html)]), "id", "text").collect()[0]
        assert "script" not in r["text"] and "{" not in r["text"]
        assert "<" in r["text"]  # decoded &lt;3 survives
        assert "Hello world" in r["text"]
        assert 'Tom & Jerry <3 "q" \'s\' end' in r["text"]
        assert r["n_before"] == len(html)
        assert r["n_after"] == len(r["text"])

    def test_double_encoded_amp_single_decode(self, spark):
        from jsonschema_spark.operators.text import strip_html

        r = strip_html(_docs(spark, [(1, "a &amp;lt; b")]), "id", "text").collect()[0]
        # one decode pass: &amp;lt; -> &lt; literal, NOT '<'
        assert r["text"] == "a &lt; b"

    def test_plan_is_pure_projection(self, spark):
        from jsonschema_spark.operators.text import strip_html

        p = _plan(strip_html(_docs(spark, [(1, "x")]), "id", "text"))
        assert "Exchange" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestCompressionRatio:
    def test_repetitive_text_compresses_below_prose(self, spark):
        import zlib

        from jsonschema_spark.operators.heuristics import compression_ratio

        prose = "The quick brown fox jumps over the lazy dog near the riverbank today."
        boiler = "click here to subscribe " * 40
        df = spark.createDataFrame([(1, prose), (2, boiler), (3, ""), (4, None)],
                                   "id int, text string")
        out = {r["id"]: r for r in compression_ratio(df, "id", "text").collect()}
        # exact parity with local zlib at the same level
        assert out[1]["n_compressed"] == len(zlib.compress(prose.encode(), 6))
        assert out[2]["n_compressed"] == len(zlib.compress(boiler.encode(), 6))
        assert out[2]["ratio"] < 0.2 < out[1]["ratio"]
        assert out[3]["ratio"] is None and out[3]["n_bytes"] == 0
        assert out[4]["ratio"] is None  # null text -> compresses empty

    def test_single_arrow_udf_no_shuffle(self, spark):
        from jsonschema_spark.operators.heuristics import compression_ratio

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = compression_ratio(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p
        # exactly ONE Arrow-batched python eval (the staged UDF), none duplicated
        assert p.count("ArrowEvalPython") == 1
