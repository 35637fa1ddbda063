"""Benchmark decontamination: flag training documents that overlap an
evaluation set's n-grams.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM / Llama
style): build the set of distinct word n-grams of every benchmark document,
then score each training doc by the fraction of ITS n-grams that appear in
that set; docs above a threshold are contaminated and dropped.

Scale shape: the benchmark side is small (eval suites are thousands of
docs) — its distinct-n-gram relation is broadcast, so the training side
needs ONE map-side semi-join probe per n-gram and one partial-aggregated
count per doc; the 100 TB training corpus never shuffles its text. For a
benchmark too large to broadcast, the same plan degrades gracefully to a
shuffled semi-join on the n-gram hash (flip broadcast=False) — same
correctness, one exchange keyed by 16-byte digests.

Reference analogue: none (training-data pipeline extension, task spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import tokens, word_ngrams

__all__ = ["ngram_set", "contamination_scores", "decontaminate"]


def _gram_hashes(df: DataFrame, text_col: str, n: int):
    """Stage tokens as an attribute, then md5 each positional n-gram — the
    token array is materialized once per row (slice/element_at inside a HOF
    lambda over an inline tokens(...) would re-tokenize per gram)."""
    staged = df.withColumn("__toks", tokens(F.col(text_col)))
    grams = F.transform(word_ngrams(F.col("__toks"), n), lambda g: F.md5(g))
    return staged, grams


def ngram_set(df: DataFrame, text_col: str, n: int = 8) -> DataFrame:
    """Distinct md5 digests of the word n-grams of `text_col` (one column,
    `gh`). md5 keeps the relation 16 bytes/gram and engine-portable for
    oracles. Docs shorter than n words contribute nothing."""
    staged, grams = _gram_hashes(df, text_col, n)
    return staged.select(F.explode(grams).alias("gh")).distinct()


def contamination_scores(
    train: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_grams: DataFrame,
    n: int = 8,
    *,
    broadcast: bool = True,
) -> DataFrame:
    """(id, n_grams, n_contaminated, contamination_frac) per training doc.

    `benchmark_grams` is ngram_set(...) of the eval suite. Distinct n-grams
    of each training doc are probed against it; docs with fewer than n words
    have no grams and score 0.0 (nothing to leak)."""
    staged, grams = _gram_hashes(train, text_col, n)
    exploded = staged.select(
        F.col(id_col).alias("id"),
        F.explode_outer(F.array_distinct(grams)).alias("gh"),
    )
    bench = benchmark_grams.select(F.col("gh").alias("bgh"), F.lit(True).alias("hit"))
    if broadcast:
        bench = F.broadcast(bench)
    return (
        exploded.join(bench, exploded["gh"] == bench["bgh"], "left")
        .groupBy("id")
        .agg(
            F.count("gh").alias("n_grams"),
            F.count("hit").alias("n_contaminated"),
        )
        .select(
            "id",
            "n_grams",
            "n_contaminated",
            F.when(
                F.col("n_grams") > 0,
                F.col("n_contaminated").cast("double") / F.col("n_grams"),
            )
            .otherwise(0.0)
            .alias("contamination_frac"),
        )
    )


def decontaminate(
    train: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    benchmark_text_col: str,
    n: int = 8,
    max_frac: float = 0.0,
    *,
    broadcast: bool = True,
) -> DataFrame:
    """Drop training docs whose contamination_frac exceeds `max_frac`
    (default 0.0: any shared n-gram disqualifies). Returns the retained
    rows of `train` unchanged — the id-only drop set joins back semi-style,
    so text payloads never shuffle."""
    scores = contamination_scores(
        train, id_col, text_col, ngram_set(benchmark, benchmark_text_col, n), n,
        broadcast=broadcast,
    )
    clean_ids = scores.filter(F.col("contamination_frac") <= max_frac).select(
        F.col("id").alias(id_col)
    )
    return train.join(clean_ids, id_col, "left_semi")
