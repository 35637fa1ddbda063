"""Byte-pair-encoding merge training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the vocabulary
induction step of a BPE tokenizer, run as a distributed iterative job.

The scale property that makes corpus-level BPE training tractable: after
ONE corpus-sized pass (word extraction + count), every iteration runs on
the WORD-VOCABULARY relation — (symbol-string, weight) rows, bounded by
distinct-word count, not corpus size. Per round:

1. adjacent-pair statistics: one map-side-combining groupBy over the
   vocabulary's symbol bigrams, weighted by word count (overlapping
   occurrences count, as in the reference implementation's get_stats);
2. argmax pair: a 1-row TakeOrdered collect to the driver (count desc,
   then lexicographic (left, right) — fully deterministic);
3. merge: greedy left-to-right single-rule rewrite of every vocabulary
   word, as a row-local stack fold (push symbol; if the top two equal the
   rule, pop-pop-push merged). Because merged = left||right can never
   equal `left` (that would need an empty right symbol), a merge can
   never cascade within a round, so the stack fold computes exactly the
   classic non-overlapping greedy semantics. Each round ends in
   localCheckpoint to keep lineage flat (mirrors graph.pagerank).

Words are lowercased whitespace tokens; a word's initial symbol string
is its characters space-joined plus a terminal '</w>' marker symbol (the
word-boundary convention of the original paper).

Reference analogue: none (training-data pipeline extension, task spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.operators.dedup import tokens

__all__ = ["bpe_train_merges", "bpe_token_counts"]

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("left_sym", T.StringType(), False),
        T.StructField("right_sym", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_n", T.LongType(), False),
    ]
)


def _merge_rule(sym_col, left: str, right: str):
    """Greedy left-to-right single-rule merge over a space-joined symbol
    string, as a stack fold (see module docstring for why this equals the
    non-overlapping greedy semantics)."""
    merged = left + right
    folded = F.aggregate(
        F.split(sym_col, " "),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.concat_ws(" ", folded)


def bpe_train_merges(
    df: DataFrame,
    text_col: str,
    *,
    rounds: int = 4,
) -> DataFrame:
    """(round, left_sym, right_sym, merged, pair_n) — the first `rounds`
    BPE merge rules learned from the corpus, in learning order. pair_n is
    the (word-count-weighted, overlap-counting) frequency of the winning
    adjacent symbol pair at the time it was chosen."""
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = words.select(
        F.concat(
            F.regexp_replace(F.col("w"), "(.)", "$1 "), F.lit("</w>")
        ).alias("sym"),
        "n",
    ).localCheckpoint(eager=True)

    out: list[tuple] = []
    for r in range(int(rounds)):
        s = F.split(F.col("sym"), " ")
        pairs = (
            vocab.select(
                F.explode(
                    F.arrays_zip(
                        F.slice(s, 1, F.size(s) - 1).alias("l"),
                        F.slice(s, 2, F.size(s) - 1).alias("r"),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not best:
            break
        l, rt, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        out.append((r, l, rt, l + rt, cnt))
        if r < rounds - 1:
            vocab = (
                vocab.select(_merge_rule(F.col("sym"), l, rt).alias("sym"), "n")
                .groupBy("sym")
                .agg(F.sum("n").alias("n"))
                .localCheckpoint(eager=True)
            )
    return spark.createDataFrame(out, _OUT_SCHEMA)


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    rounds: int = 4,
) -> DataFrame:
    """(id, n_words, n_chars_syms, n_bpe_syms): per-document token counts
    under the first `rounds` learned BPE merges — the train→apply loop
    closed (what a tokenizer-aware data pipeline uses to price documents
    into a token budget BEFORE paying for real tokenization).

    Scale shape: training is vocab-bounded (`bpe_train_merges`); the apply
    side rewrites the VOCABULARY (distinct words) through the learned
    rules — each rule one row-local greedy fold — and the per-document
    count is a words⋈vocab equi-join + sum, so the corpus-sized work is
    the word explode and one join keyed on the word, never a per-document
    re-merge. n_chars_syms is the pre-merge symbol count (chars + </w>).
    """
    spark = df.sparkSession
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train_merges(df, text_col, rounds=rounds).collect()
    ]
    words = (
        df.select(
            F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = (
        words.select("w").distinct().select(
            "w",
            F.concat(
                F.regexp_replace(F.col("w"), "(.)", "$1 "), F.lit("</w>")
            ).alias("sym"),
        )
    )
    for l, r in merges:
        vocab = vocab.select("w", _merge_rule(F.col("sym"), l, r).alias("sym"))
    vocab = vocab.select(
        "w",
        (F.length("w") + 1).alias("pre"),
        F.size(F.split(F.col("sym"), " ")).alias("post"),
    )
    return (
        words.join(vocab, "w")
        .groupBy("id")
        .agg(
            F.sum("n").cast("bigint").alias("n_words"),
            F.sum(F.col("n") * F.col("pre")).cast("bigint").alias("n_chars_syms"),
            F.sum(F.col("n") * F.col("post")).cast("bigint").alias("n_bpe_syms"),
        )
    )
