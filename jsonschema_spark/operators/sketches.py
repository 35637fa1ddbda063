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

__all__ = [
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "cms_join_size",
    "hll_build",
    "hll_merge",
    "hll_estimate",
    "hll_intersect_estimate",
    "kmv_build",
    "kmv_merge",
    "kmv_estimate",
    "kmv_intersect_estimate",
]


def _cell(h: Column, d: int, width: int) -> Column:
    """Row-d counter column from a term's md5 digest: hex chars
    [1+8d, 9+8d) (32 bits) mod width. All depth rows derive from ONE md5
    over 'cms:term' — disjoint 32-bit slices of a 128-bit digest are
    independent enough for the CMS min bound in practice, and one digest
    per input row is 4× cheaper than a digest per (row, depth) at the
    sketch build's hot spot. Caps depth at 4 (128 bits / 32)."""
    return F.conv(F.substring(h, 1 + 8 * d, 8), 16, 10).cast("bigint") % F.lit(
        int(width)
    )


def _digest(term: Column) -> Column:
    return F.md5(F.concat(F.lit("cms:"), term))


def cms_build(
    items: DataFrame, term_col: str, *, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Build the (d, col, cnt) counter relation over a stream of items
    (one input row = one occurrence). Cells with zero hits are absent —
    readers must coalesce to 0 (`cms_estimate` does).
    """
    if not 1 <= int(depth) <= 4:
        raise ValueError("cms depth must be in 1..4 (32 digest bits per row)")
    staged = items.select(_digest(F.col(term_col)).alias("__h"))
    cells = staged.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(F.col("__h"), d, width).alias("col"),
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
    staged = cand.select("term", _digest(F.col("term")).alias("__h"))
    cells = staged.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(F.col("__h"), d, width).alias("col"),
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


# --- HyperLogLog (Flajolet et al. 2007) as a mergeable register relation ---
#
# The sketch IS a DataFrame of (reg, max_rho) rows — at most m = 2^p rows
# however large the input. Register index = first p bits of an md5-derived
# hash; rho = 1 + leading-zero count of the remaining 120 bits, computed
# hex-digit-wise (leading-zero NIBBLES via regexp + a 16-way CASE on the
# first non-zero nibble) so the whole derivation is integer-exact and
# byte-identical in any engine with md5 — no float log2 at any point.
# Build exchanges ≤ m rows per task (map-side max-combine); union+max of
# two register relations IS the sketch of the concatenated inputs.

_HLL_P = 8  # 256 registers; standard error 1.04/sqrt(m) ≈ 6.5%


def _hll_rho(rem: Column) -> Column:
    """1 + leading-zero-bit count of a 30-hex-digit string (121 if zero)."""
    z = F.length(F.regexp_extract(rem, "^(0*)", 1))
    first = F.regexp_extract(rem, "^0*(.)", 1)
    nib_lz = (
        F.when(first.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
        .when(first.isin("4", "5", "6", "7"), 1)
        .when(first.isin("2", "3"), 2)
        .otherwise(3)
    )
    return (
        F.when(rem.rlike("^0+$"), F.lit(121))
        .otherwise(z * 4 + nib_lz + 1)
        .cast("int")
    )


def hll_build(
    items: DataFrame, term_col: str, *, group_cols: tuple = ()
) -> DataFrame:
    """(*group_cols, reg, max_rho) HyperLogLog register relation over a
    term column — one independent sketch per group when `group_cols` is
    given (per-day / per-partition sketches that later `hll_merge` into
    coarser rollups without touching raw data). NULL terms are skipped;
    registers never hit are absent (readers treat them as rho 0 —
    `hll_estimate` does)."""
    h = F.md5(F.concat(F.lit("hll:"), F.col(term_col).cast("string")))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rho = _hll_rho(F.substring(h, 3, 30))
    gcols = list(group_cols)
    return (
        items.where(F.col(term_col).isNotNull())
        .select(*gcols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*gcols, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register relations and re-max per register — exactly the
    sketch of the concatenated inputs (max is the register monoid)."""
    it = iter(sketches)
    acc = next(it)
    for s in it:
        acc = acc.unionByName(s)
    return acc.groupBy("reg").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(sketch: DataFrame) -> DataFrame:
    """One row (n_registers_hit, estimate): the HLL cardinality estimate
    with the standard small-range linear-counting correction. Harmonic
    sum + hit count is one tiny aggregation over ≤ m rows."""
    m = 1 << _HLL_P
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_registers_hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("hit_sum"),
    )
    denom = F.col("hit_sum") + (F.lit(m) - F.col("n_registers_hit"))
    raw = F.lit(alpha * m * m) / denom
    zeros = F.lit(m) - F.col("n_registers_hit")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return agg.select(
        "n_registers_hit", est.alias("estimate")
    )


def cms_join_size(a: DataFrame, b: DataFrame) -> DataFrame:
    """One row (est_rows): the count-min inner-product estimate of the
    inner equi-join cardinality |A ⋈ B| on the sketched key —
    est = min_d Σ_col cntA[d][col]·cntB[d][col] (Cormode & Muthukrishnan
    2005, §4.2). Always an over-estimate in expectation (hash collisions
    add cross terms); error ≤ e/width · N_A·N_B per row, min over depth
    rows. The whole estimate reads TWO sketch relations (≤ depth·width
    rows each) — no raw data, so a query planner can cost a join between
    two 100 TB tables from kilobytes of pre-built sketch."""
    j = a.select("d", "col", F.col("cnt").alias("ca")).join(
        b.select("d", "col", F.col("cnt").alias("cb")), ["d", "col"]
    )
    per_d = j.groupBy("d").agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    return per_d.agg(F.min("dot").cast("bigint").alias("est_rows"))


def hll_intersect_estimate(a: DataFrame, b: DataFrame) -> DataFrame:
    """One row (est_a, est_b, est_union, est_intersection): the
    inclusion-exclusion intersection estimate |A∩B| ≈ |A| + |B| − |A∪B|
    from two register relations alone (union = hll_merge, each term a
    ≤ m-row aggregation). Error compounds the three HLL errors — fine for
    overlap triage (e.g. "how much does corpus A share with corpus B"
    before paying for an exact KMV/join pass); can go negative on tiny
    true overlaps, clamped at 0."""
    ea = hll_estimate(a).select(F.col("estimate").alias("est_a"))
    eb = hll_estimate(b).select(F.col("estimate").alias("est_b"))
    eu = hll_estimate(hll_merge(a, b)).select(F.col("estimate").alias("est_union"))
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0.0)
            ).alias("est_intersection"),
        )
    )


# --------------------------------------------------------------- KMV (bottom-k)

_KMV_H48 = 1 << 48  # 12 hex chars — enough precision for the estimator


def _kmv_hex(term: Column) -> Column:
    """Full md5 hex of 'kmv:term' — the sketch value. Lowercase fixed-width
    hex orders identically to the 128-bit integer it encodes, so bottom-k
    is a plain string ORDER BY in any engine; the estimator reads only the
    first 12 hex chars (48 bits) as an integer."""
    return F.md5(F.concat(F.lit("kmv:"), term.cast("string")))


def _kmv_h48(hex_col: Column) -> Column:
    return F.conv(F.substring(hex_col, 1, 12), 16, 10).cast("bigint")


def kmv_build(
    items: DataFrame,
    term_col: str,
    *,
    k: int = 32,
    group_cols: tuple = (),
    oversample: int = 8,
) -> DataFrame:
    """(*group_cols, rk, hx) bottom-k (KMV / min-wise) sample sketch over a
    term column — the k smallest md5 hashes of the DISTINCT terms, one
    independent sketch per group. Mergeable (union + re-bottom-k ==
    sketch of the concatenation — min-wise sampling is coordinated across
    sketches because the hash, not an RNG, picks survivors) and doubles as
    a distinct-count estimator (`kmv_estimate`) and a uniform sample of
    the distinct domain (quantile/Jaccard probes).

    Scale shape: a naive bottom-k would `distinct()` the full (group,
    term) domain through an exchange and then sort it. Instead a first
    map-side-combining pass computes `approx_count_distinct` per group
    (HLL, deterministic), and a broadcast-joined hash THRESHOLD
    `oversample·k / nd` prefilters the scan — only ~oversample·k rows per
    group survive to the (tiny) distinct + row_number. P[the true k-th
    hash exceeds the threshold] ≤ exp(-Θ(k·oversample)) (Chernoff; ~e^-93
    at k=32, oversample=8, including HLL's ±5%): at 10^12 rows the wide
    ops run over O(groups·k·oversample) rows, and the scan's only full
    pass is the cheap count. Groups with nd ≤ oversample·k skip the
    filter entirely (threshold saturates at 1)."""
    gcols = list(group_cols)
    staged = (
        items.where(F.col(term_col).isNotNull())
        .select(*gcols, _kmv_hex(F.col(term_col)).alias("hx"))
    )
    nd = staged.groupBy(*gcols).agg(
        F.approx_count_distinct("hx").alias("_nd")
    )
    thr = F.least(
        F.lit(_KMV_H48),
        (F.lit(int(oversample * k) * _KMV_H48) / F.greatest(F.col("_nd"), F.lit(1)))
        .cast("bigint")
        + F.lit(1),
    )
    if gcols:
        survivors = staged.join(F.broadcast(nd.select(*gcols, thr.alias("_thr"))), gcols)
    else:
        survivors = staged.crossJoin(F.broadcast(nd.select(thr.alias("_thr"))))
    survivors = survivors.where(_kmv_h48(F.col("hx")) <= F.col("_thr")).select(
        *gcols, "hx"
    )
    return _kmv_topk(survivors.distinct(), k, gcols)


def _kmv_topk(rel: DataFrame, k: int, gcols: list) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(*gcols).orderBy("hx") if gcols else Window.orderBy("hx")
    return (
        rel.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(*gcols, "rk", "hx")
    )


def kmv_merge(*sketches: DataFrame, k: int = 32, group_cols: tuple = ()) -> DataFrame:
    """Union sketch relations and re-bottom-k per group. Because survivors
    are hash-selected, bottom-k of a union of per-part bottom-k sets IS
    the bottom-k of the union of the underlying domains — per-day sketches
    roll up to any coarser grain without touching raw data (tested)."""
    it = iter(sketches)
    acc = next(it)
    for s in it:
        acc = acc.unionByName(s)
    gcols = list(group_cols)
    return _kmv_topk(acc.select(*gcols, "hx").distinct(), k, gcols)


def kmv_estimate(sketch: DataFrame, *, k: int = 32, group_cols: tuple = ()) -> DataFrame:
    """(*group_cols, n_sketch, est) distinct-count estimate per group: if
    the sketch holds fewer than k hashes it holds the WHOLE domain (est =
    n_sketch, exact); else the classic KMV estimator (k-1)/h_(k) with
    h_(k) as a 48-bit fraction — evaluated in pure 64-bit integer
    arithmetic ((k-1)·2^48 DIV h48, exact and engine-identical; no float
    division). Relative error ~ 1/sqrt(k-2)."""
    gcols = list(group_cols)
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max(_kmv_h48(F.col("hx"))).alias("_kth"),
    )
    est = F.when(F.col("n_sketch") < k, F.col("n_sketch")).otherwise(
        F.expr(f"CAST({(k - 1) * _KMV_H48} AS BIGINT) DIV _kth")
    )
    return agg.select(*gcols, "n_sketch", est.cast("bigint").alias("est"))


def kmv_intersect_estimate(a: DataFrame, b: DataFrame, *, k: int = 32) -> DataFrame:
    """One row (n_a, n_b, n_union_sample, n_both, est_a, est_b, est_union,
    est_intersection, jaccard) from two ungrouped KMV sketches ALONE — the
    min-wise counterpart of `hll_intersect_estimate`, with the better
    variance story: bottom-k of the union is a uniform k-sample of the
    union's distinct domain, and membership of a sample hash in BOTH
    input sketches is EXACT intersection membership (coordinated
    sampling), so jaccard ≈ n_both / |sample| with ~1/sqrt(k) error and
    est_intersection = n_both·est_union DIV |sample| in pure 64-bit
    integer arithmetic. The whole estimate reads 2k sketch rows — two
    100 TB tables' key-overlap triaged from kilobytes (referential
    integrity pre-check, join-size costing)."""
    ah = a.select(F.col("hx").alias("hx"))
    bh = b.select(F.col("hx").alias("hx"))
    union_sk = _kmv_topk(ah.unionByName(bh).distinct(), k, [])
    flagged = (
        union_sk.join(ah.withColumn("_in_a", F.lit(1)), "hx", "left")
        .join(bh.withColumn("_in_b", F.lit(1)), "hx", "left")
    )
    est = lambda n_sk, kth: F.when(n_sk < k, n_sk).otherwise(  # noqa: E731
        F.expr(f"CAST({(k - 1) * _KMV_H48} AS BIGINT) DIV {kth}")
    )
    ua = a.agg(F.count(F.lit(1)).alias("n_a"), F.max(_kmv_h48(F.col("hx"))).alias("_ka"))
    ub = b.agg(F.count(F.lit(1)).alias("n_b"), F.max(_kmv_h48(F.col("hx"))).alias("_kb"))
    uu = flagged.agg(
        F.count(F.lit(1)).alias("n_union_sample"),
        F.sum(
            (F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull()).cast("bigint")
        ).alias("n_both"),
        F.max(_kmv_h48(F.col("hx"))).alias("_ku"),
    )
    snap = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.000001)) / F.lit(1000000.0)  # noqa: E731
    return (
        ua.crossJoin(ub)
        .crossJoin(uu)
        .select(
            "n_a",
            "n_b",
            "n_union_sample",
            "n_both",
            est(F.col("n_a"), "_ka").cast("bigint").alias("est_a"),
            est(F.col("n_b"), "_kb").cast("bigint").alias("est_b"),
            est(F.col("n_union_sample"), "_ku").cast("bigint").alias("est_union"),
            F.expr(
                "CAST(CASE WHEN n_union_sample > 0 THEN "
                f"(n_both * (CASE WHEN n_union_sample < {k} THEN n_union_sample "
                f"ELSE CAST({(k - 1) * _KMV_H48} AS BIGINT) DIV _ku END)) "
                "DIV n_union_sample ELSE 0 END AS BIGINT)"
            ).alias("est_intersection"),
            snap(
                F.col("n_both").cast("double") / F.col("n_union_sample")
            ).alias("jaccard"),
        )
    )
