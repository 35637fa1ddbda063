"""Streaming volume anomalies: per-window per-key event counts z-scored
against a frozen per-key baseline.

The streaming companion to `operators/timeseries.rolling_anomalies`: a
continuous-ingest monitor can't look back over its own output to build the
trailing window (that would be a second stateful operator over results),
so the blessed per-key (mean, std) for one window-duration of traffic is
frozen upstream — from the batch rollup over a reference period — and
folded in as map literals. Each closed window then costs ONE watermarked
streaming aggregation keyed on (window, key); state is bounded by
windows-in-flight × live keys.

Emits every closed (window, key) cell with its z-score and an `anomalous`
flag: |z| > threshold, or a key the baseline has never seen (novel keys
are anomalies by definition; their z is NULL). A key silent for a whole
window produces NO row here — append-mode streaming cannot emit a row for
data that never arrived; silent-key detection stays with the batch
`rolling_anomalies` gap-fill (documented split).

Late rows beyond the watermark are dropped (same contract as
stream_violation_metrics). Reference analogue: none (streaming extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_volume_anomaly"]


def stream_volume_anomaly(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    baseline: dict[str, tuple[float, float]],
    *,
    window_duration: str = "1 minute",
    watermark: str = "5 minutes",
    z_thresh: float = 3.0,
) -> DataFrame:
    """(window, key, n_events, z, anomalous) per closed window × observed
    key. `baseline` maps key -> (mean, std) of its count over ONE
    `window_duration` of blessed traffic; std must be > 0 (a constant-rate
    key has no scale for a z-score — pre-floor it upstream)."""
    if not baseline:
        raise ValueError("stream_volume_anomaly: baseline must be non-empty")
    for k, (_m, s) in baseline.items():
        if s <= 0:
            raise ValueError(f"stream_volume_anomaly: baseline std for {k!r} must be > 0")
    mean_map = F.create_map(
        *[c for k, (m, _s) in baseline.items() for c in (F.lit(k), F.lit(float(m)))]
    )
    std_map = F.create_map(
        *[c for k, (_m, s) in baseline.items() for c in (F.lit(k), F.lit(float(s)))]
    )
    win = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("window"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    mean = mean_map[F.col("key")]
    std = std_map[F.col("key")]
    z = (F.col("n_events").cast("double") - mean) / std
    return win.select(
        "window",
        "key",
        "n_events",
        z.alias("z"),
        (mean.isNull() | (F.abs(z) > F.lit(float(z_thresh)))).alias("anomalous"),
    )
