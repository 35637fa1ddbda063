"""Streaming distribution drift: per-window PSI / KS against a frozen
baseline distribution.

The batch drift operators (operators/drift.py) compare two relations; a
continuous-ingest deployment instead wants "is THIS window drifting from the
blessed snapshot?". Both operators here fold the baseline in as literals
(dict -> fixed category/bucket set), so each window's statistic is computed
in ONE watermarked streaming aggregation — no second stateful operator, no
stream-stream join, state bounded by windows-in-flight:

    groupBy(window) . agg(conditional count per category/bucket)
        -> projection combining counts with baseline literals into PSI/KS

Late rows beyond the watermark are dropped (same contract as
stream_violation_metrics). Output mode append: a window's statistic emits
once, when the watermark passes it — these rows are the checkpointable
drift-metrics stream the north rule's monitoring sink ingests.

Reference analogue: none (streaming extension; batch PSI/KS mirror the
reference suite's drift checks — see operators/drift.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_psi", "stream_ks", "stream_js"]

_EPS = 1e-6


def _normalized(baseline: dict[str, float]) -> dict[str, float]:
    total = float(sum(baseline.values()))
    if total <= 0:
        raise ValueError("baseline fractions must sum to a positive value")
    return {k: v / total for k, v in baseline.items()}


def stream_psi(
    stream_df: DataFrame,
    ts_col: str,
    category_col: str,
    baseline: dict[str, float],
    *,
    window_duration: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-window PSI of `category_col` against baseline {category: frac}.

    Categories absent from the baseline are lumped into one __other__ mass
    with p = eps (they are pure drift). Returns (window, doc_count, psi).
    """
    base = _normalized(baseline)
    cats = list(base)
    c = F.col(category_col)
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    for i, k in enumerate(cats):
        aggs.append(F.sum(F.when(c == k, 1).otherwise(0)).alias(f"c__{i}"))
    aggs.append(F.sum(F.when(~c.isin(*cats) | c.isNull(), 1).otherwise(0)).alias("c__other"))
    win = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("window"))
        .agg(*aggs)
    )

    def term(cnt: Column, p: float) -> Column:
        q = F.greatest(cnt / F.col("doc_count"), F.lit(_EPS))
        pl = F.lit(max(p, _EPS))
        return (pl - q) * F.log(pl / q)

    psi = term(F.col("c__other"), 0.0)
    for i, k in enumerate(cats):
        psi = psi + term(F.col(f"c__{i}"), base[k])
    return win.select("window", "doc_count", psi.alias("psi"))


def stream_js(
    stream_df: DataFrame,
    ts_col: str,
    category_col: str,
    baseline: dict[str, float],
    *,
    window_duration: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-window Jensen–Shannon divergence of `category_col` against the
    frozen baseline — the bounded (ln 2) companion to `stream_psi`: an
    alerting sink can use a fixed threshold even when a window introduces
    categories the baseline has never seen (where PSI's magnitude is
    driven by the epsilon floor, not the data). Same single watermarked
    aggregation; returns (window, doc_count, js)."""
    base = _normalized(baseline)
    cats = list(base)
    c = F.col(category_col)
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    for i, k in enumerate(cats):
        aggs.append(F.sum(F.when(c == k, 1).otherwise(0)).alias(f"c__{i}"))
    aggs.append(F.sum(F.when(~c.isin(*cats) | c.isNull(), 1).otherwise(0)).alias("c__other"))
    win = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("window"))
        .agg(*aggs)
    )

    def term(cnt: Column, p: float) -> Column:
        q = F.greatest(cnt / F.col("doc_count"), F.lit(_EPS))
        pl = F.lit(max(p, _EPS))
        m = (pl + q) / 2
        return 0.5 * pl * F.log(pl / m) + 0.5 * q * F.log(q / m)

    js = term(F.col("c__other"), 0.0)
    for i, k in enumerate(cats):
        js = js + term(F.col(f"c__{i}"), base[k])
    return win.select("window", "doc_count", js.alias("js"))


def stream_ks(
    stream_df: DataFrame,
    ts_col: str,
    value_col: str,
    baseline_edges: list[float],
    baseline_cum: list[float],
    *,
    window_duration: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-window bucketed KS statistic of `value_col` against a baseline
    ECDF frozen as (edges, cumulative fractions at those edges).

    `baseline_cum[i]` is the baseline P(X <= edges[i]); typically edges are
    the baseline's quantiles so buckets are equi-probable (the same bounded
    construction as operators/drift.py ks_statistic's bucketed default).
    Returns (window, doc_count, ks) — the max |ECDF_window - ECDF_baseline|
    over the edge set. Bucket count bounds both accuracy and state width.
    """
    if len(baseline_edges) != len(baseline_cum) or not baseline_edges:
        raise ValueError("need equal-length, non-empty edges and cumulative fractions")
    if sorted(baseline_edges) != list(baseline_edges):
        raise ValueError("edges must be ascending")
    v = F.col(value_col).cast("double")
    aggs = [F.count(v).alias("doc_count")]
    for i, e in enumerate(baseline_edges):
        aggs.append(F.sum(F.when(v <= F.lit(e), 1).otherwise(0)).alias(f"le__{i}"))
    win = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("window"))
        .agg(*aggs)
    )
    diffs = [
        F.abs(F.col(f"le__{i}") / F.col("doc_count") - F.lit(float(c)))
        for i, c in enumerate(baseline_cum)
    ]
    ks = diffs[0] if len(diffs) == 1 else F.greatest(*diffs)
    return win.select("window", "doc_count", ks.alias("ks"))
