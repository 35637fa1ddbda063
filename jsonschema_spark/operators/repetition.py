"""Repetition-based quality signals (Gopher-rule family) + boilerplate
paragraph removal.

Three operators a web-scale text-curation pipeline runs after exact/near
dedup (operators/dedup.py removes duplicate DOCUMENTS; these target
repetition WITHIN a document and boilerplate ACROSS documents):

- line_repetition_signals: per-doc duplicate-line fraction and the char
  mass sitting in duplicated lines — pure array HOFs, shuffle-free. The
  within-row occurrence count is O(L^2) in lines-per-doc; L is structural
  (hundreds at most), so the quadratic term is bounded per row and never
  touches an exchange.
- top_ngram_coverage: fraction of characters covered by the most frequent
  word n-gram of each doc. Deliberately NOT a within-row HOF (that would be
  O(words^2) per doc): explode n-grams carrying their char weight, count by
  (doc, gram), keep the per-doc max — linear work, two partial-aggregated
  shuffles keyed by doc id, the standard scale shape.
- repeated_paragraph_filter: corpus-level boilerplate ("subscribe to our
  newsletter") — paragraphs hashed (md5, engine-portable for oracles),
  counted across the corpus, then each doc scored by the fraction of its
  paragraphs that are corpus-repeated. Only 16-byte digests cross the
  paragraph-count exchange; text payloads never shuffle.

Reference analogue: none (training-data pipeline extension; thresholds from
the Gopher/MassiveText filtering rules, Rae et al. 2021, arXiv:2112.11446).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "line_repetition_signals",
    "top_ngram_coverage",
    "repeated_paragraph_filter",
    "remove_repeated_paragraphs",
]


def _lines(text):
    return F.filter(F.split(text, "\n"), lambda x: F.length(F.trim(x)) > 0)


def line_repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc (id, n_lines, dup_line_frac, dup_line_char_frac).

    dup_line_frac: 1 - distinct_lines/lines; dup_line_char_frac: chars in
    lines occurring more than once / total line chars (every copy counts,
    matching the Gopher "duplicate line character fraction" definition).
    """
    # stage the line array as an attribute: the nested occurrence-count
    # lambda below references `lines` PER ELEMENT, and HOF lambda bodies
    # re-evaluate inline expressions with no CSE — staged, the O(L^2) term
    # scans a materialized array instead of re-splitting the text L times
    staged = df.select(F.col(id_col).alias("id"), _lines(F.col(text_col)).alias("__lines"))
    lines = F.col("__lines")
    n = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    total_chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    dup_chars = F.aggregate(
        F.filter(lines, lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1),
        F.lit(0),
        lambda a, x: a + F.length(x),
    )
    return staged.select(
        F.col("id"),
        n.alias("n_lines"),
        F.when(n > 0, 1.0 - n_distinct.cast("double") / n).otherwise(0.0).alias("dup_line_frac"),
        F.when(total_chars > 0, dup_chars.cast("double") / total_chars)
        .otherwise(0.0)
        .alias("dup_line_char_frac"),
    )


def top_ngram_coverage(df: DataFrame, id_col: str, text_col: str, n: int = 2) -> DataFrame:
    """Per-doc most-frequent word n-gram and its character coverage:
    (id, top_ngram, top_ngram_char_frac). Docs with fewer than n words get
    frac 0 and a NULL gram. Deterministic tie-break: count desc, gram asc."""
    from jsonschema_spark.operators.dedup import tokens, word_ngrams

    # stage the token array: building grams via element_at(tokens(text), i)
    # inside a transform lambda re-tokenizes the text once PER GRAM (no CSE
    # in HOF lambda bodies) — measured ~5x on the sf0.1 corpus
    staged = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    base = staged.select(
        F.col("id"),
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).alias("total_chars"),
        word_ngrams(toks, n).alias("grams"),
    )
    counts = (
        base.select("id", "total_chars", F.explode_outer("grams").alias("gram"))
        .groupBy("id", "total_chars", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # per-doc argmax with a deterministic, oracle-reproducible tie-break
    # (cnt desc, gram asc). The window partitions by doc id over the already
    # aggregated relation — rows-per-partition = distinct grams of ONE doc,
    # never the raw corpus.
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(
        F.col("cnt").desc(), F.col("gram").asc_nulls_last()
    )
    top = counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    # chars covered: cnt * gram chars minus the n-1 separator chars per hit
    cover = F.col("cnt") * (F.length("gram") - F.lit(n - 1))
    return top.select(
        "id",
        F.col("gram").alias("top_ngram"),
        F.when(
            F.col("gram").isNotNull() & (F.col("total_chars") > 0),
            F.least(cover.cast("double") / F.col("total_chars"), F.lit(1.0)),
        )
        .otherwise(0.0)
        .alias("top_ngram_char_frac"),
    )


def repeated_paragraph_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_repeats: int = 2,
    max_repeated_frac: float = 0.3,
) -> DataFrame:
    """Corpus-level boilerplate scoring: (id, n_paras, repeated_para_frac,
    keep). A paragraph is "repeated" when its normalized hash occurs in at
    least `min_repeats` DISTINCT documents; a doc is kept while less than
    `max_repeated_frac` of its paragraphs are such boilerplate."""
    paras = _lines(F.col(text_col))
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(paras).alias("pos", "para"),
    ).select("id", "pos", F.md5(F.lower(F.trim(F.col("para")))).alias("ph"))
    corpus = exploded.groupBy("ph").agg(
        F.countDistinct("id").alias("docs_with")
    )
    scored = (
        exploded.join(corpus, "ph")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum((F.col("docs_with") >= min_repeats).cast("int")).alias("n_repeated"),
        )
    )
    frac = F.col("n_repeated").cast("double") / F.col("n_paras")
    return scored.select(
        "id",
        "n_paras",
        frac.alias("repeated_para_frac"),
        (frac < max_repeated_frac).alias("keep"),
    )


def remove_repeated_paragraphs(
    df: DataFrame, id_col: str, text_col: str, *, min_repeats: int = 2
) -> DataFrame:
    """Line-wise corpus dedup (RefinedWeb-style): REMOVE boilerplate lines
    and keep the document. A line is boilerplate when its normalized
    (lower+trim) hash occurs in at least `min_repeats` DISTINCT docs; the
    doc's text is rebuilt from the surviving lines in original order.
    Returns (id, text, n_lines, n_removed); a doc whose every line is
    boilerplate keeps an empty text.

    Scale: the exchange carries (id, pos, 16-byte line hash) — the flagged
    relation is bare hashes and the rebuild groups lines of a doc back
    together with a map-side-combining collect_list bounded by doc size.
    Line PAYLOADS travel exactly once (to the rebuild), never through the
    counting aggregation."""
    exploded = (
        df.select(F.col(id_col).alias("id"), _lines(F.col(text_col)).alias("__lines"))
        .select("id", F.posexplode("__lines").alias("pos", "line"))
        .withColumn("ph", F.md5(F.lower(F.trim(F.col("line")))))
    )
    flagged = (
        exploded.groupBy("ph")
        .agg(F.countDistinct("id").alias("docs_with"))
        .filter(F.col("docs_with") >= min_repeats)
        .select("ph")
    )
    kept = exploded.join(flagged, "ph", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
        )
    )
