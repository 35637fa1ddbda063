"""Count-min sketch: a mergeable frequency summary as a plain relation.

The sketch IS a DataFrame of (d, col, cnt) counter cells — depth × width
rows at most, regardless of input size. That makes it:

- **bounded on the wire**: the build's only exchange is the (d, col)
  groupBy, and map-side partial aggregation collapses every task's output
  to ≤ depth·width cells before the shuffle — at 10^12 tokens the exchange
  still carries ≤ depth·width rows per task;
- **mergeable**: union two sketch relations and re-sum per cell — the
  result is exactly the sketch of the concatenated inputs (tested), so
  per-partition / per-day sketches roll up without touching raw data;
- **oracle-expressible**: cells are md5-derived (same 60-bit prefix trick
  as `operators/sampling.py`), so DuckDB reproduces the estimates
  bit-for-bit.

Estimates are the classic CMS upper bound: est(t) = min_d cnt[d][h_d(t)]
≥ true(t), with overcount ≤ ε·N at the usual (ε, δ) = (e/width,
e^-depth) guarantees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_estimate"]


def _cell(term: Column, d: int, width: int) -> Column:
    """Row-d counter column for a term: 60-bit md5 prefix of 'cms{d}:term'
    mod width — independent-enough hash rows, identical in any md5 SQL."""
    h = F.md5(F.concat(F.lit(f"cms{d}:"), term))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % F.lit(int(width))


def cms_build(
    items: DataFrame, term_col: str, *, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Build the (d, col, cnt) counter relation over a stream of items
    (one input row = one occurrence). Cells with zero hits are absent —
    readers must coalesce to 0 (`cms_estimate` does).
    """
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(F.col(term_col), d, width).alias("col"),
                    )
                    for d in range(int(depth))
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.d").alias("d"), F.col("c.col").alias("col")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): cell-wise sum.
    merge(build(A), build(B)) == build(A ++ B) exactly."""
    if not sketches:
        raise ValueError("cms_merge: need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("d", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: list[str],
    *,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point estimates for a fixed candidate list: (term, cms_count).
    cms_count = min over the depth rows of the term's cells (absent cell
    ⇒ 0). The candidate cell list (|candidates|·depth rows) broadcasts
    into the sketch join."""
    if not candidates:
        raise ValueError("cms_estimate: need at least one candidate term")
    spark = sketch.sparkSession
    cand = spark.createDataFrame([(t,) for t in candidates], "term string")
    cells = cand.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(F.col("term"), d, width).alias("col"),
                    )
                    for d in range(int(depth))
                ]
            )
        ).alias("c"),
    ).select("term", F.col("c.d").alias("d"), F.col("c.col").alias("col"))
    joined = F.broadcast(cells).join(sketch, ["d", "col"], "left")
    return joined.groupBy("term").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count")
    )
