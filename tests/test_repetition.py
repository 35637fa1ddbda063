"""Repetition quality signals (operators/repetition.py) on hand-built docs."""

from __future__ import annotations

import pytest

from jsonschema_spark.operators.repetition import (
    line_repetition_signals,
    repeated_paragraph_filter,
    top_ngram_coverage,
)


def test_line_repetition_fracs(spark):
    df = spark.createDataFrame(
        [(1, "a\nb\na\n\nc"), (2, "x\ny"), (3, ""), (4, None)], "id int, text string"
    )
    rows = {r["id"]: r for r in line_repetition_signals(df, "id", "text").collect()}
    # doc 1: lines [a,b,a,c] -> 4 lines, 3 distinct; dup chars 2/4
    assert rows[1]["n_lines"] == 4
    assert rows[1]["dup_line_frac"] == pytest.approx(0.25)
    assert rows[1]["dup_line_char_frac"] == pytest.approx(0.5)
    assert rows[2]["dup_line_frac"] == 0.0
    assert rows[3]["dup_line_frac"] == 0.0 and rows[3]["n_lines"] == 0


def test_top_bigram_coverage(spark):
    df = spark.createDataFrame([(1, "x y x y z"), (2, "hello")], "id int, text string")
    rows = {r["id"]: r for r in top_ngram_coverage(df, "id", "text", n=2).collect()}
    assert rows[1]["top_ngram"] == "x y"
    # "x y" occurs twice, covering 2*2 = 4 of 5 token chars
    assert rows[1]["top_ngram_char_frac"] == pytest.approx(0.8)
    assert rows[2]["top_ngram"] is None and rows[2]["top_ngram_char_frac"] == 0.0


def test_top_ngram_deterministic_tiebreak(spark):
    df = spark.createDataFrame([(1, "b a c a")], "id int, text string")
    # bigrams 'b a','a c','c a' all cnt=1 -> gram asc picks 'a c'
    (r,) = top_ngram_coverage(df, "id", "text", n=2).collect()
    assert r["top_ngram"] == "a c"


def test_repeated_paragraph_filter(spark):
    boiler = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, f"{boiler}\nunique one"),
            (2, f"{boiler}\nunique two\nunique three"),
            (3, "all original\ncontent here"),
        ],
        "id int, text string",
    )
    rows = {
        r["id"]: r
        for r in repeated_paragraph_filter(
            df, "id", "text", min_repeats=2, max_repeated_frac=0.4
        ).collect()
    }
    assert rows[1]["repeated_para_frac"] == pytest.approx(0.5) and not rows[1]["keep"]
    assert rows[2]["repeated_para_frac"] == pytest.approx(1 / 3) and rows[2]["keep"]
    assert rows[3]["repeated_para_frac"] == 0.0 and rows[3]["keep"]


def test_repeated_paragraph_counts_distinct_docs(spark):
    # the same paragraph twice in ONE doc is intra-doc repetition, not
    # corpus boilerplate: docs_with = 1 stays below min_repeats
    df = spark.createDataFrame([(1, "dup\ndup\nother")], "id int, text string")
    (r,) = repeated_paragraph_filter(df, "id", "text", min_repeats=2).collect()
    assert r["repeated_para_frac"] == 0.0 and r["keep"]


def test_remove_repeated_paragraphs_rebuilds_in_order(spark):
    from jsonschema_spark.operators.repetition import remove_repeated_paragraphs

    df = spark.createDataFrame(
        [
            (1, "Subscribe now\nreal content one\nmore content"),
            (2, "intro text\nsubscribe NOW \nclosing words"),
            (3, "subscribe now\nonly boilerplate here"),
            (4, "only boilerplate here\n"),
        ],
        "id int, text string",
    )
    out = {r["id"]: r for r in remove_repeated_paragraphs(df, "id", "text").collect()}
    # the shared line is removed case/whitespace-insensitively, the rest
    # keeps its original form and order
    assert out[1]["text"] == "real content one\nmore content"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[2]["text"] == "intro text\nclosing words"
    # doc 3: both lines are corpus-repeated -> empty text, row preserved
    assert out[3]["text"] == "" and out[3]["n_removed"] == 2
    assert out[4]["text"] == "" and out[4]["n_lines"] == 1


def test_remove_repeated_paragraphs_min_repeats(spark):
    from jsonschema_spark.operators.repetition import remove_repeated_paragraphs

    df = spark.createDataFrame(
        [(1, "a shared line\nunique one"), (2, "a shared line\nunique two")],
        "id int, text string",
    )
    out = {r["id"]: r for r in remove_repeated_paragraphs(df, "id", "text", min_repeats=3).collect()}
    # threshold 3 not met by 2 docs -> nothing removed
    assert out[1]["n_removed"] == 0 and out[1]["text"] == "a shared line\nunique one"
