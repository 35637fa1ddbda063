"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + typed metadata structs; decode /
feature-extraction / frame-sampling run as Arrow-batched ``mapInPandas`` stages
partitioned by media_ref hash. The actual codec step is STUBBED in this
container (no image/audio libs) behind ``decoder=`` injection — the Spark-side
plumbing (schema, batching, partitioning, UDF signatures) is real and tested
with a deterministic fake decoder.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["MEDIA_FEATURES_DDL", "extract_media_features", "fake_decoder", "real_decoder", "resize_images", "sample_frames", "fake_resizer"]

MEDIA_FEATURES_DDL = (
    "media_ref string, media_type string, n_bytes bigint, "
    "feature vector_hash string, width int, height int, duration_ms int"
)


def real_decoder(payload: bytes, media_type: str) -> dict[str, Any]:
    """Placeholder for a real codec (PIL/ffmpeg) — not available here."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; inject a decoder "
        "or use fake_decoder for pipeline testing"
    )


def fake_decoder(payload: bytes, media_type: str) -> dict[str, Any]:
    """Deterministic fake: derives stable pseudo-metadata from the payload
    hash so tests are reproducible without codec libraries."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "feature_hash": h[:16].hex(),
        "width": 64 + h[0] if media_type == "image" else None,
        "height": 64 + h[1] if media_type == "image" else None,
        "duration_ms": int.from_bytes(h[2:5], "big") % 600_000 if media_type in ("audio", "video") else None,
    }


def extract_media_features(
    media: DataFrame,
    *,
    ref_col: str = "media_ref",
    type_col: str = "media_type",
    payload_col: str = "payload",
    decoder: Callable[[bytes, str], dict[str, Any]] = real_decoder,
    num_partitions: int | None = None,
) -> DataFrame:
    """binary payloads → typed feature rows, Arrow-batched.

    Partitioned by hash(media_ref) so one oversized video doesn't skew a
    partition of small thumbnails beyond what AQE can rebalance.
    """
    out_ddl = (
        f"{ref_col} string, {type_col} string, n_bytes bigint, "
        "feature_hash string, width int, height int, duration_ms int"
    )
    src = media.select(ref_col, type_col, payload_col)
    if num_partitions:
        src = src.repartition(num_partitions, F.xxhash64(F.col(ref_col)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, mtype, payload in zip(pdf[ref_col], pdf[type_col], pdf[payload_col]):
                meta = decoder(bytes(payload) if payload is not None else b"", mtype)
                rows.append(
                    {
                        ref_col: ref,
                        type_col: mtype,
                        "n_bytes": len(payload) if payload is not None else 0,
                        "feature_hash": meta.get("feature_hash"),
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "duration_ms": meta.get("duration_ms"),
                    }
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=out_ddl)


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: tags the payload hash with the target box
    (real impl: PIL thumbnail) — output is a stable stand-in payload."""
    h = hashlib.sha256((payload or b"") + f"{width}x{height}".encode()).digest()
    return h


def resize_images(
    media: DataFrame,
    *,
    width: int,
    height: int,
    ref_col: str = "media_ref",
    payload_col: str = "payload",
    resizer: Callable[[bytes, int, int], bytes] = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """image payloads → resized payloads, Arrow-batched mapInPandas.

    Real codecs aren't installed here; inject `resizer` (default raises like
    real_decoder). Output schema: (media_ref, payload binary, width, height).
    """
    if resizer is None:
        def resizer(p, w, h):  # noqa: ANN001
            raise NotImplementedError("image codecs not installed; inject a resizer")

    src = media.select(ref_col, payload_col)
    if num_partitions:
        src = src.repartition(num_partitions, F.xxhash64(F.col(ref_col)))
    out_ddl = f"{ref_col} string, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    ref_col: pdf[ref_col],
                    "payload": [
                        resizer(bytes(p) if p is not None else b"", width, height)
                        for p in pdf[payload_col]
                    ],
                    "width": width,
                    "height": height,
                }
            )
            yield out

    return src.mapInPandas(run, schema=out_ddl)


def sample_frames(
    media: DataFrame,
    *,
    every_ms: int = 1000,
    ref_col: str = "media_ref",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
    frame_fn: Callable[[bytes, int], bytes] = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """video payloads → one row per sampled frame timestamp (explode on the
    executor inside the Arrow batch — a single video never leaves one task).

    Output: (media_ref, ts_ms, frame binary); `frame_fn(payload, ts_ms)`
    extracts a frame (stub raises; tests inject a deterministic fake).
    """
    if frame_fn is None:
        def frame_fn(p, t):  # noqa: ANN001
            raise NotImplementedError("video codecs not installed; inject frame_fn")

    src = media.select(ref_col, payload_col, duration_col)
    if num_partitions:
        src = src.repartition(num_partitions, F.xxhash64(F.col(ref_col)))
    out_ddl = f"{ref_col} string, ts_ms int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, tss, frames = [], [], []
            for ref, payload, dur in zip(pdf[ref_col], pdf[payload_col], pdf[duration_col]):
                dur = int(dur) if dur is not None and not pd.isna(dur) else 0
                for ts in range(0, max(dur, 1), every_ms):
                    refs.append(ref)
                    tss.append(ts)
                    frames.append(frame_fn(bytes(payload) if payload is not None else b"", ts))
            yield pd.DataFrame({ref_col: refs, "ts_ms": tss, "frame": frames})

    return src.mapInPandas(run, schema=out_ddl)
