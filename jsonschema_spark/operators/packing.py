"""Document packing: assign docs to fixed-token-budget packs (pretraining
batch prep — concat-then-chunk semantics).

A global greedy packer is inherently sequential, so packing is SHARDED:
each document lands in a deterministic md5-derived shard, is ordered inside
the shard by a stable key, and the shard's running token count is chunked
by the budget. Pack boundaries never cross shards, so:

- the only shuffle is the shard exchange (window partitionBy), and each
  shard packs independently — embarrassingly parallel across shards;
- the assignment is reproducible regardless of cluster size, input
  partitioning, or execution order (window is keyed on data, not on Spark
  task layout) — and expressible in any engine with window functions, so
  it is oracle-checkable;
- shard count is the scale knob: size n_shards so a shard's docs fit an
  executor's sort/spill budget (WindowExec sorts within partitions and
  spills gracefully).

Reference analogue: none (training-data pipeline extension, task spec).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_documents", "pack_stats", "interleaved_token_cost"]


def _shard(key: Column, n_shards: int, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % n_shards).alias("shard")


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    *,
    budget: int,
    n_shards: int = 256,
    salt: str = "pack",
) -> DataFrame:
    """Adds (shard, pack_id, tok_offset): concat-then-chunk pack assignment.

    Within a shard, documents are concatenated in `id_col` order and the
    stream is chunked every `budget` tokens; `pack_id` is the chunk index
    where this document STARTS and `tok_offset` its token offset inside
    that chunk. Documents longer than the budget span chunks (standard
    concat-and-chunk pretraining behavior) — they still get the pack of
    their first token."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    out = df.withColumn("shard", _shard(F.col(id_col), n_shards, salt))
    w = Window.partitionBy("shard").orderBy(F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("bigint")
    # integer division (`div`), not float floor: double arithmetic loses
    # exactness past 2^53 tokens per shard, and double->int CASTs truncate
    # in Spark but round in other engines — oracles must agree bit-for-bit
    return (
        out.withColumn("__start", start)
        .withColumn("pack_id", F.expr(f"__start div {int(budget)}"))
        .withColumn("tok_offset", F.col("__start") % budget)
        .drop("__start")
    )


def interleaved_token_cost(spans_col, *, media_token_cost: int = 64):
    """Token-budget cost of an interleaved text+media span sequence: the
    whitespace token count of every text span plus a fixed
    ``media_token_cost`` per media span (vision-token placeholder
    accounting — the packer needs the budget arithmetic, not the codec; a
    tokenizer- or resolution-aware cost drops in by swapping this Column).

    ONE ``aggregate`` fold over the spans array — row-local, no explode, no
    shuffle — so costing a 10^12-doc corpus is a projection riding the scan.
    A NULL text span costs 0 (``token_count`` of NULL is NULL → coalesced).
    """
    from jsonschema_spark.operators.text import token_count

    col = F.col(spans_col) if isinstance(spans_col, str) else spans_col
    return F.aggregate(
        col,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.when(
            x["kind"] == F.lit("media"), F.lit(int(media_token_cost)).cast("bigint")
        ).otherwise(F.coalesce(token_count(x["text"]).cast("bigint"), F.lit(0))),
    )


def pack_stats(
    df: DataFrame,
    id_col: str,
    token_col: str,
    *,
    budget: int,
    n_shards: int = 256,
    salt: str = "pack",
) -> DataFrame:
    """ONE row of packing-efficiency metrics for a concat-then-chunk run:
    (n_docs, n_shards_used, n_packs, total_tokens, waste_tokens, fill_rate).

    Under concat-then-chunk, every pack except the last of each shard is
    exactly full, so the whole readout reduces to per-shard token sums: one
    map-side-combining groupBy(shard) to <= n_shards rows, then integer
    arithmetic (packs = ceil(sum/budget) via `div`; waste = packs*budget -
    sum; exact past 2^53). fill_rate = total_tokens / (n_packs * budget),
    rounded to 6 — the number a batch-prep pipeline watches when tuning
    budget and shard count."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    per_shard = (
        df.withColumn("shard", _shard(F.col(id_col), n_shards, salt))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col(token_col).cast("bigint")).alias("toks"),
        )
        .withColumn("packs", F.expr(f"(toks + {budget} - 1) div {budget}"))
    )
    return per_shard.agg(
        F.sum("docs").alias("n_docs"),
        F.count(F.lit(1)).alias("n_shards_used"),
        F.sum("packs").alias("n_packs"),
        F.sum("toks").alias("total_tokens"),
        (F.sum("packs") * F.lit(budget) - F.sum("toks")).alias("waste_tokens"),
        F.round(
            F.sum("toks").cast("double") / (F.sum("packs") * F.lit(budget)), 6
        ).alias("fill_rate"),
    )
