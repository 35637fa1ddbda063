"""PII redaction (training-data curation op)."""

from pyspark.sql import functions as F


def test_redact_pii_kinds_and_counts(spark):
    from jsonschema_spark.operators.text import redact_pii

    rows = [
        (1, "write to alice.smith+x@corp.example.org today"),
        (2, "see https://docs.example.com/a?b=1 and http://x.io"),
        (3, "call +44 20 7946 0958 now"),
        (4, "nothing sensitive here"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    got = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    assert got[1]["text"] == "write to [REDACTED] today" and got[1]["n_email"] == 1
    assert got[2]["text"] == "see [REDACTED] and [REDACTED]" and got[2]["n_url"] == 2
    assert got[3]["text"] == "call [REDACTED] now" and got[3]["n_phone"] == 1
    assert got[4]["text"] == "nothing sensitive here"
    assert got[4]["n_email"] == got[4]["n_url"] == got[4]["n_phone"] == 0
    assert got[5]["text"] is None


def test_redact_pii_plan_is_narrow(spark):
    from jsonschema_spark.operators.text import redact_pii

    df = spark.createDataFrame([(1, "x")], "doc_id: bigint, text: string")
    p = redact_pii(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_domain_stats(spark):
    from jsonschema_spark.operators.text import domain_stats

    df = spark.createDataFrame(
        [
            (1, "see http://A.Example.com/x and https://a.example.com/y"),
            (2, "link https://a.example.com:8080/z plus http://other.net/"),
            (3, "no urls here"),
        ],
        "id int, text string",
    )
    rows = {r["domain"]: r for r in domain_stats(df, "id", "text").collect()}
    # host extraction lowercases and stops at /, :, or whitespace
    assert rows["a.example.com"]["n_urls"] == 3
    assert rows["a.example.com"]["n_docs"] == 2
    assert rows["other.net"]["n_urls"] == 1 and rows["other.net"]["n_docs"] == 1
    assert set(rows) == {"a.example.com", "other.net"}


class TestTfidfKeywords:
    def test_rare_term_outranks_common(self, spark):
        from jsonschema_spark.operators.text import tfidf_keywords

        df = spark.createDataFrame(
            [
                (1, "common common common unique1"),
                (2, "common common zebra"),
                (3, "common filler words here"),
            ],
            "doc_id long, text string",
        )
        out = {(r["id"], r["rank"]): r["term"] for r in tfidf_keywords(df, "doc_id", "text", top_k=2).collect()}
        # 'unique1' (df=1) beats 'common' (df=3) for doc 1 despite lower tf? no:
        # tf(common)=3, idf(common)=ln(4/4)+1=1 -> 3.0; tf(unique1)=1, idf=ln(4/2)+1≈1.693
        assert out[(1, 1)] == "common" and out[(1, 2)] == "unique1"
        # doc 2: zebra idf 1.693 > common tf2*1.0 = 2.0? 1.693 < 2.0 -> common first
        assert out[(2, 1)] == "common" and out[(2, 2)] == "zebra"

    def test_vocab_cap_drops_tail_terms(self, spark):
        from jsonschema_spark.operators.text import tfidf_keywords

        df = spark.createDataFrame(
            [(1, "aa aa bb"), (2, "aa bb cc"), (3, "aa dd")],
            "doc_id long, text string",
        )
        # cap=2 keeps only the 2 highest-df terms (aa df=3, bb df=2)
        out = tfidf_keywords(df, "doc_id", "text", top_k=3, vocab_size=2).collect()
        assert {r["term"] for r in out} == {"aa", "bb"}

    def test_plan_broadcasts_idf_no_python(self, spark):
        from jsonschema_spark.operators.text import tfidf_keywords

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = tfidf_keywords(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "BroadcastHashJoin" in p


class TestCleanText:
    def test_rules(self, spark):
        from jsonschema_spark.operators.text import clean_text

        df = spark.createDataFrame(
            [
                (1, "a\tb\u0007c\u200bd"),
                (2, "x \r\n y\n\n\n\n\nz"),
                (3, "  padded  "),
                (4, ""),
            ],
            "doc_id long, text string",
        )
        out = {r["id"]: r for r in clean_text(df, "doc_id", "text").collect()}
        assert out[1]["text"] == "a bcd"
        assert out[2]["text"] == "x\ny\n\nz"
        assert out[3]["text"] == "padded"
        assert out[4]["text"] == "" and out[4]["n_before"] == 0
        assert out[1]["n_before"] == 7 and out[1]["n_after"] == 5

    def test_plan_is_projection(self, spark):
        from jsonschema_spark.operators.text import clean_text

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = clean_text(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p and "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestBpeTokenCount:
    def test_gpt2_pretoken_boundaries(self, spark):
        from pyspark.sql import functions as F

        from jsonschema_spark.operators.text import bpe_token_count

        cases = [
            # "Hello" ", world" "!" " It" "'s" " " -> wait: segments below
            (0, "Hello, world! It's 2026.", 8),  # Hello|,| world|!| It|'s| 2026|.
            (1, "don't stop", 3),                # don|'t| stop
            (2, "", 0),
            (3, "bar42", 2),                     # bar|42 (letter run, digit run)
            (4, "--", 1),                        # one punct run
        ]
        df = spark.createDataFrame([(i, t) for i, t, _ in cases], "id int, text string")
        out = {r["id"]: r["c"] for r in df.select("id", bpe_token_count(F.col("text")).alias("c")).collect()}
        for i, _, want in cases:
            assert out[i] == want, (i, out[i], want)

    def test_pure_projection_no_python(self, spark):
        from pyspark.sql import functions as F

        from jsonschema_spark.operators.text import bpe_token_count

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = docs.select(bpe_token_count(F.col("text")).alias("c"))._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestPmiCollocations:
    def test_collocation_beats_frequent_nonphrase(self, spark):
        from jsonschema_spark.operators.text import pmi_collocations

        # "new york" always adjacent; "the" frequent everywhere (high count,
        # low association); pmi must rank the phrase first
        docs = spark.createDataFrame(
            [(f"d{i}", "visit new york the city the people the bridge") for i in range(6)]
            + [(f"e{i}", "the weather the news the coffee") for i in range(6)],
            "doc_id string, text string",
        )
        rows = pmi_collocations(docs, "text", min_count=5, top_k=10).collect()
        assert rows, "no collocations found"
        pair = {(r["w1"], r["w2"]): r for r in rows}
        assert ("new", "york") in pair
        ny = pair[("new", "york")]
        assert ny["c_pair"] == 6 and ny["c_w1"] == 6 and ny["c_w2"] == 6
        # a perfectly-associated pair must outrank any 'the'-pair
        the_pairs = [r for r in rows if r["w1"] == "the" or r["w2"] == "the"]
        assert all(ny["pmi_ratio"] > t["pmi_ratio"] for t in the_pairs)

    def test_min_count_prunes_and_determinism(self, spark):
        from jsonschema_spark.operators.text import pmi_collocations

        docs = spark.createDataFrame(
            [("d1", "alpha beta gamma"), ("d2", "alpha beta delta")],
            "doc_id string, text string",
        )
        out = pmi_collocations(docs, "text", min_count=2, top_k=5)
        rows = [(r["w1"], r["w2"]) for r in out.collect()]
        assert rows == [("alpha", "beta")]  # only pair reaching min_count
        assert rows == [(r["w1"], r["w2"]) for r in out.collect()]  # stable
