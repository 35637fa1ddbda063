"""Custom stateful streaming operator: cross-micro-batch doc_id dedup via
applyInPandasWithState (the task-spec extension point for operators Spark's
built-ins can't express — first-seen-wins semantics across an unbounded
stream, with timeout-bounded state).

Built-in `dropDuplicates` on a stream keeps unbounded state keyed by value;
this operator keeps ONE tiny state row per doc_id group, emits only the
first-seen document, and expires state after `state_ttl` of event time has
passed its watermark — the bounded-state shape a 10^12-doc ingest needs.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["dedup_doc_ids_stateful"]


def _duration_ms(spec: str) -> int:
    """Parse a Spark-style duration ('10 minutes', '30 seconds') to ms."""
    n, unit = spec.strip().split(None, 1)
    mult = {
        "millisecond": 1,
        "second": 1_000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s").lower()]
    return int(float(n) * mult)


def dedup_doc_ids_stateful(
    stream: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    state_ttl: str | None = None,
) -> DataFrame:
    """First occurrence of each doc_id passes; later duplicates are dropped,
    across micro-batches, with state expiring via EventTimeTimeout once the
    watermark passes last-seen + state_ttl (bounded state).

    state_ttl defaults to the watermark horizon. The timeout is an ABSOLUTE
    event-time timestamp (last seen event + ttl), so keys first seen in
    batch 0 — when getCurrentWatermarkMs() is still 0 — get a real expiry
    too, instead of unbounded state."""
    out_schema = stream.schema
    state_schema = "seen_ms long"
    ttl_ms = _duration_ms(state_ttl if state_ttl is not None else watermark)

    cols = [f.name for f in stream.schema.fields]

    def dedup(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        first: pd.DataFrame | None = None
        max_ts_ms = 0
        for pdf in pdfs:
            if len(pdf) > 0:
                ts = pd.to_datetime(pdf[ts_col]).astype("int64").max() // 1_000_000
                max_ts_ms = max(max_ts_ms, int(ts))
                if not already and first is None:
                    first = pdf.iloc[:1]
        if already:
            seen_ms = max(int(state.get[0]), max_ts_ms)
        else:
            seen_ms = max_ts_ms
        state.update((seen_ms,))
        # must exceed the current watermark; max() guarantees that even when
        # the watermark has already passed seen_ms
        state.setTimeoutTimestamp(max(seen_ms, state.getCurrentWatermarkMs()) + ttl_ms)
        if first is not None:
            yield first[cols]

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(doc_id_col)
        .applyInPandasWithState(
            dedup,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
