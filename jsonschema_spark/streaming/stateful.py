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


def dedup_doc_ids_stateful(
    stream: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence of each doc_id passes; later duplicates are dropped,
    across micro-batches, with state expiring via EventTimeTimeout once the
    watermark passes (bounded state)."""
    out_schema = stream.schema
    state_schema = "seen long"

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
        for pdf in pdfs:
            if not already and len(pdf) > 0 and first is None:
                first = pdf.iloc[:1]
        if not already:
            state.update((1,))
        if state.getCurrentWatermarkMs() > 0:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 600_000)
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
