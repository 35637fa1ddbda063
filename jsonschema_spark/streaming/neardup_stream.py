"""Streaming MinHash-LSH near-duplicate detection: cross-micro-batch
candidate pairs via applyInPandasWithState.

Batch LSH dedup (`operators/dedup.lsh_candidate_pairs`) self-joins the
corpus on (band, bucket). A stream can't self-join its own history — the
history IS state. This operator keeps, per LSH bucket, the signatures of
the documents that have landed there, and emits a candidate pair the moment
a new document collides with a stored one. The expensive text work
(normalize → shingle → minhash fold) happens BEFORE the stateful step as
pure Column projections that ride the stream batch-side; the Python state
function only compares tiny fixed-length signatures.

State is bounded two ways, because at 10^12 docs unbounded bucket state is
the whole failure mode:
  - per-bucket cap (`max_bucket`): a bucket holds at most this many stored
    signatures, FIFO-evicted — a pathological hot bucket (empty docs, a
    boilerplate signature) degrades to bounded recall instead of unbounded
    memory;
  - event-time TTL: a bucket untouched past the watermark + ttl drops its
    whole state row (EventTimeTimeout), matching the dedup-window contract
    of `stateful.dedup_doc_ids_stateful`.

Output is the per-collision candidate relation (id_a, id_b, band, est_sim)
with id_a < id_b; a pair sharing several bands is emitted once per band
(distinct on the bare ids downstream, exactly like the batch pipeline's
pre-dedup relation). `est_sim` is the full-signature agreement fraction —
identical to the batch estimator, so stream and batch agree pair-for-pair
(pinned by tests/test_neardup_stream.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from jsonschema_spark.streaming.stateful import _duration_ms

__all__ = ["stream_near_dup_candidates"]

_SIG_SEP = "|"

_OUT_SCHEMA = StructType(
    [
        StructField("id_a", StringType()),
        StructField("id_b", StringType()),
        StructField("band", IntegerType()),
        StructField("est_sim", DoubleType()),
    ]
)


def _band_bucket_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str,
    *,
    k: int,
    bands: int,
    rows_per_band: int,
    shingle_n: int,
) -> DataFrame:
    """Stream-side projection: (band, bucket, id, sig_str, ts) — one row per
    (doc, band). Reuses the batch operators' exact hash family and bucket
    key so stream candidates equal batch candidates."""
    from jsonschema_spark.operators.dedup import minhash_fold, shingles

    sig = minhash_fold(shingles(F.col(text_col), shingle_n), k)
    staged = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(ts_col).alias("__ts"),
        sig.alias("__sig"),
    )
    bb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col("__sig")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ],
                        )
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
    )
    return staged.select(
        "id",
        "__ts",
        F.array_join("__sig", _SIG_SEP).alias("sig_str"),
        bb.alias("bb"),
    ).select(
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        "id",
        "sig_str",
        "__ts",
    )


def stream_near_dup_candidates(
    stream: DataFrame,
    *,
    id_col: str = "id",
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    k: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    min_est_sim: float = 0.0,
    watermark: str = "10 minutes",
    state_ttl: str | None = None,
    max_bucket: int = 64,
) -> DataFrame:
    """Candidate near-duplicate pairs across an unbounded document stream.

    bands * rows_per_band must equal k (the batch LSH contract). Within a
    micro-batch, rows are processed in (event-time, id) order and compared
    against both the stored state AND earlier rows of the same batch, so
    co-arriving duplicates are still caught; ordering makes the emitted
    pair set deterministic for a given batch decomposition.
    """
    if bands * rows_per_band != k:
        raise ValueError(
            f"bands*rows_per_band must equal k: {bands}*{rows_per_band} != {k}"
        )
    ttl_ms = _duration_ms(state_ttl if state_ttl is not None else watermark)
    cap = int(max_bucket)
    thr = float(min_est_sim)
    kk = float(k)

    # state: parallel FIFO of stored member ids/signatures + last event time
    state_schema = "ids string, sigs string, last_ms long"
    _MEMBER_SEP = "\x1e"

    def match(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        band = int(key[0])
        if state.exists:
            ids_blob, sigs_blob, last_ms = state.get
            ids = ids_blob.split(_MEMBER_SEP) if ids_blob else []
            sigs = [s.split(_SIG_SEP) for s in sigs_blob.split(_MEMBER_SEP)] if sigs_blob else []
            last_ms = int(last_ms)
        else:
            ids, sigs, last_ms = [], [], 0

        out_a: list[str] = []
        out_b: list[str] = []
        out_e: list[float] = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts_ms = pd.to_datetime(pdf["__ts"]).astype("int64") // 1_000_000
            order = sorted(range(len(pdf)), key=lambda i: (int(ts_ms.iloc[i]), str(pdf["id"].iloc[i])))
            for i in order:
                doc_id = str(pdf["id"].iloc[i])
                sig = str(pdf["sig_str"].iloc[i]).split(_SIG_SEP)
                last_ms = max(last_ms, int(ts_ms.iloc[i]))
                for other_id, other_sig in zip(ids, sigs):
                    if other_id == doc_id:
                        continue
                    est = sum(1 for x, y in zip(sig, other_sig) if x == y) / kk
                    if est >= thr:
                        a, b = sorted((doc_id, other_id))
                        out_a.append(a)
                        out_b.append(b)
                        out_e.append(est)
                ids.append(doc_id)
                sigs.append(sig)
                if len(ids) > cap:
                    ids = ids[-cap:]
                    sigs = sigs[-cap:]
        state.update(
            (
                _MEMBER_SEP.join(ids),
                _MEMBER_SEP.join(_SIG_SEP.join(s) for s in sigs),
                last_ms,
            )
        )
        state.setTimeoutTimestamp(max(last_ms, state.getCurrentWatermarkMs()) + ttl_ms)
        if out_a:
            yield pd.DataFrame(
                {
                    "id_a": out_a,
                    "id_b": out_b,
                    "band": band,
                    "est_sim": out_e,
                }
            )

    projected = _band_bucket_stream(
        stream,
        id_col,
        text_col,
        ts_col,
        k=k,
        bands=bands,
        rows_per_band=rows_per_band,
        shingle_n=shingle_n,
    )
    return (
        projected.withWatermark("__ts", watermark)
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            match,
            outputStructType=_OUT_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
