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

__all__ = ["zorder_key"]


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
