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

__all__ = ["zorder_key", "compaction_plan", "zone_map_stats", "zone_map_prune_audit"]


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


def zone_map_stats(
    manifest_rows: "DataFrame",
    *,
    file_col: str,
    value_cols: list,
) -> "DataFrame":
    """Per-file zone maps as a tall relation (file, column, vmin, vmax,
    n_rows, n_null) — the parquet-footer / Iceberg-manifest statistics
    that drive data skipping, built in ONE map-side-combining aggregation
    pass (no Expand: per-column min/max are plain agg columns, unpivoted
    AFTER the groupBy so the exchange carries one row per file).
    Mergeable to coarser grains by construction: min/max/sum re-aggregate
    (file → partition → table) without touching data. Values are cast to
    double — zone bounds are DATA values, no arithmetic, so they are
    engine-exact."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in value_cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"_null_{c}"),
        ]
    per_file = manifest_rows.groupBy(F.col(file_col).alias("file")).agg(*aggs)
    tall = None
    for c in value_cols:
        part = per_file.select(
            "file",
            F.lit(c).alias("column"),
            F.col(f"_min_{c}").alias("vmin"),
            F.col(f"_max_{c}").alias("vmax"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
        )
        tall = part if tall is None else tall.unionByName(part)
    return tall


def zone_map_prune_audit(
    zmaps: "DataFrame",
    predicates: list,
) -> "DataFrame":
    """Skipping audit: for each closed-range predicate (column, lo, hi),
    how many files (and rows) the zone maps alone prune — a file is
    skippable when [vmin, vmax] is disjoint from [lo, hi] (all-NULL zones
    are skippable for a range predicate too). Output one row per
    predicate: (column, lo, hi, files_total, files_pruned, rows_pruned).
    Runs entirely on the zone-map relation (metadata scale); this is the
    readout that justifies `zorder_key` — a column uncorrelated with the
    layout prunes ~nothing until the table is re-clustered."""
    out = None
    for col, lo, hi in predicates:
        zm = zmaps.where(F.col("column") == col)
        prunable = (
            (F.col("vmax") < F.lit(float(lo)))
            | (F.col("vmin") > F.lit(float(hi)))
            | (F.col("n_null") == F.col("n_rows"))
        )
        row = zm.agg(
            F.count(F.lit(1)).alias("files_total"),
            F.sum(prunable.cast("bigint")).alias("files_pruned"),
            F.sum(F.when(prunable, F.col("n_rows")).otherwise(F.lit(0))).alias(
                "rows_pruned"
            ),
        ).select(
            F.lit(col).alias("column"),
            F.lit(float(lo)).alias("lo"),
            F.lit(float(hi)).alias("hi"),
            "files_total",
            "files_pruned",
            "rows_pruned",
        )
        out = row if out is None else out.unionByName(row)
    return out
