"""URL canonicalization + URL-level dedup (operators/text.canonicalize_url /
url_dedup): rule-by-rule canonicalizer pins and the plan-shape gate (no
Python, no window — min-id via commutative agg)."""

from pyspark.sql import functions as F

from jsonschema_spark.operators.text import canonicalize_url, url_dedup


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string").select(
        canonicalize_url(F.col("url")).alias("c")
    )
    return df.collect()[0]["c"]


def test_canonicalize_rules(spark):
    cases = {
        # fragment stripped
        "http://a.com/x#frag": "http://a.com/x",
        # tracking params stripped, others kept
        "http://a.com/x?utm_source=n&id=3": "http://a.com/x?id=3",
        "http://a.com/x?id=3&utm_campaign=n&fbclid=z": "http://a.com/x?id=3",
        # bare tracking query collapses entirely
        "http://a.com/x?utm_source=n": "http://a.com/x",
        # scheme+host lowercased, path case preserved
        "HTTP://WWW.A.COM/Path": "http://www.a.com/Path",
        # default ports stripped per scheme, non-default kept
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        "http://a.com:8080/x": "http://a.com:8080/x",
        # trailing slashes trimmed (root included)
        "http://a.com/x///": "http://a.com/x",
        "http://a.com/": "http://a.com",
        # query preserved after a trailing-slash path
        "http://a.com/x/?id=1": "http://a.com/x?id=1",
    }
    for raw, want in cases.items():
        assert _canon(spark, raw) == want, f"{raw!r} -> {_canon(spark, raw)!r} != {want!r}"


def test_url_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [
            (10, "http://a.com/x?utm_source=s"),
            (3, "HTTP://A.COM:80/x"),
            (7, "http://b.com/y"),
        ],
        "doc_id long, url string",
    )
    rows = {r["id"]: r for r in url_dedup(df, "doc_id", "url").collect()}
    assert rows[3]["keep"] and not rows[10]["keep"]
    assert rows[3]["canonical_url"] == rows[10]["canonical_url"] == "http://a.com/x"
    assert rows[3]["group_size"] == 2
    assert rows[7]["keep"] and rows[7]["group_size"] == 1


def test_url_dedup_plan_no_python_no_window(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")], "doc_id long, url string")
    p = _plan(url_dedup(df, "doc_id", "url"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Window" not in p, "min-id per group must be an agg, not a sorted window"
