"""Streaming referential integrity: FK column → dimension catalog, unbounded.

The batch operator (operators/referential.py — media_ref → media catalog,
reference: result.go ToList violations) lifts to Structured Streaming
directly because stream-static LEFT ANTI and LEFT OUTER joins are
append-mode-safe: the static catalog side is (re)planned per micro-batch,
the stream side never waits on it, and no state store is involved — the
join is exactly as scale-safe as its batch twin (broadcast the catalog, or
let AQE pick per micro-batch).

Two surfaces:
  - ``stream_referential_violations``: the dangling rows themselves
    (append sink — quarantine topic / violations table);
  - ``stream_referential_metrics``: watermarked per-window
    (n_rows, n_dangling, dangling_rate) — the drift-style health signal a
    monitor alerts on, ONE windowed aggregation after the marker join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_referential_violations", "stream_referential_metrics"]


def stream_referential_violations(
    stream: DataFrame,
    fk: str,
    dim: DataFrame,
    pk: str,
    *,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Streaming rows whose non-null ``fk`` has no match in static ``dim.pk``.

    Same plan as the batch operator — reused, not reimplemented — so batch
    backfills and the live stream agree row-for-row (pinned by test)."""
    from jsonschema_spark.operators.referential import referential_violations

    return referential_violations(
        stream, fk, dim, pk, broadcast_dim=broadcast_dim or None
    )


def stream_referential_metrics(
    stream: DataFrame,
    fk: str,
    dim: DataFrame,
    pk: str,
    ts_col: str,
    *,
    window_duration: str = "1 minute",
    watermark: str = "10 minutes",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Per-window (window, n_rows, n_dangling, dangling_rate) with a
    watermark bounding the aggregation state.

    One stream-static LEFT OUTER join against the deduped catalog keys
    (a marker column says "matched"), then ONE windowed aggregation —
    null FKs count toward n_rows but are never dangling (matching the
    batch operator's isNotNull contract)."""
    keys = dim.select(F.col(pk).alias(fk)).distinct().withColumn(
        "__ref_ok", F.lit(True)
    )
    if broadcast_dim:
        keys = F.broadcast(keys)
    marked = stream.withWatermark(ts_col, watermark).join(keys, on=fk, how="left")
    dangling = F.col(fk).isNotNull() & F.col("__ref_ok").isNull()
    return (
        marked.groupBy(F.window(ts_col, window_duration).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(dangling.cast("long")).alias("n_dangling"),
        )
        .withColumn(
            "dangling_rate", F.col("n_dangling") / F.col("n_rows")
        )
    )
