"""Table-layout keys for locality-driven data skipping: Z-order
(Morton) interleaving — the clustering trick behind Delta/Iceberg
`ZORDER BY`: sort/partition a huge fact table by the interleaved bits of
two (or more) filter columns and per-file min/max zone maps become tight
on BOTH dimensions at once, so 2-D predicates prune files that a
single-column sort could never skip.

The key is pure integer bit arithmetic (shift/and/or folds — identical
in any engine, no UDF), so writers can `repartitionByRange(zkey)` /
`sortWithinPartitions(zkey)` at ingest and readers get the pruning for
free from ordinary parquet statistics.

Reference analogue: none (training-data pipeline extension, task spec).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["zorder_key", "compaction_plan"]


def zorder_key(x: Column, y: Column, *, bits: int = 8) -> Column:
    """Morton-interleave the low `bits` bits of two non-negative integer
    columns: bit i of x lands at position 2i, bit i of y at 2i+1. Inputs
    are clamped into [0, 2^bits) (out-of-range values saturate at the
    top), so callers bucket/scale continuous columns first."""
    cap = (1 << bits) - 1
    xc = F.least(F.greatest(x.cast("bigint"), F.lit(0)), F.lit(cap))
    yc = F.least(F.greatest(y.cast("bigint"), F.lit(0)), F.lit(cap))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xc, i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(yc, i) % 2, 2 * i + 1)
        )
    return z


def compaction_plan(
    manifest: "DataFrame",
    *,
    partition_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> "DataFrame":
    """Small-file compaction plan over a file manifest — the maintenance
    half of the layout story beside `zorder_key`: a 100 TB table whose
    partitions accrete thousands of sub-target files (streaming commits,
    per-executor writers) reads at open-cost, not scan-cost, until the
    files are re-binned toward a target size (Iceberg `rewrite_data_files`
    / Delta OPTIMIZE binPack).

    Within each partition, files are ordered by (size DESC, file id) and
    assigned to bins by cumulative-sum blocking: bin = floor(bytes-before
    / target). That is the sort-based next-fit plan — every bin except the
    last per partition closes at ≥ target bytes, an oversized file lands
    alone in its own bin (its predecessor total already crossed the
    boundary), and the assignment is a single window cumsum: deterministic,
    engine-identical integer arithmetic, one sort exchange over the
    MANIFEST (metadata scale — millions of rows for a 10^12-doc table,
    never the data).

    Returns one row per (partition, bin): (partition, bin, n_files,
    total_bytes) — the rewrite task list; bins with n_files == 1 and
    total_bytes ≥ target are already-compact files a runner skips.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.desc(size_col), F.asc(file_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    staged = manifest.select(
        F.col(partition_col).alias("partition"),
        F.col(size_col).cast("bigint").alias("_sz"),
        cum_before.cast("bigint").alias("_cum"),
    )
    # integer DIV, not float floor — cumulative bytes can pass 2^53 on a
    # real manifest and double division would mis-bin the tail
    binned = staged.select(
        "partition",
        "_sz",
        F.expr(f"_cum DIV {int(target_bytes)}").alias("bin"),
    )
    return binned.groupBy("partition", "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("_sz").alias("total_bytes"),
    )
