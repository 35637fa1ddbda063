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
