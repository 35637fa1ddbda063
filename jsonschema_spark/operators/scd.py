"""Slowly-changing-dimension (SCD type-2) history from an event change log.

Classic warehouse compaction: an append-only stream of (entity, ts, state)
observations becomes validity intervals — one row per state RUN, with
`valid_from` / `valid_to` microsecond bounds (`valid_to` NULL on the
current/open row) and a 1-based `version` per entity. Consecutive
observations of the SAME state collapse into one interval (run-length
compaction); a repeated state after an excursion opens a NEW version, as
SCD2 requires.

Scale shape: ONE hash exchange on the entity key; the lag / lead /
row_number windows all share that partitioning with a single Sort on
(ts, tiebreak) — the lead/version windows run on the already-filtered
change rows.
Row count out ≤ row count in, all integer arithmetic (epoch microseconds),
no floats anywhere — bit-exact against any SQL engine.

Skew: the unit is the single hottest entity (same contract as
`sessions.sessionize`); bound per-entity event counts upstream — salting
would split an entity's timeline and corrupt the run numbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.sessions import _epoch_us

__all__ = ["scd2_history"]


def scd2_history(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """(entity, state, valid_from_us, valid_to_us, version): SCD2 validity
    intervals per entity, run-length compacted, `valid_to_us` NULL on the
    open interval, `version` counting state runs 1..R in time order.

    Equal-timestamp observations order by `tiebreak_col` (required for a
    deterministic history when the log has ties; pass None only if
    (entity, ts) is unique).
    """
    from pyspark.sql import Window

    order = [F.asc("_us")] + ([F.asc("_tb")] if tiebreak_col else [])
    staged = events.select(
        F.col(entity_col).alias("entity"),
        _epoch_us(ts_col).alias("_us"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
        F.col(state_col).alias("state"),
    )
    w = Window.partitionBy("entity").orderBy(*order)
    # a change row (state differs from the previous observation) IS the run
    # start — keep only those, then lead() to close each interval and
    # row_number() to version it. All three windows share the one (entity)
    # exchange and the one (ts, tiebreak) sort.
    starts = staged.withColumn(
        "_chg",
        F.lag("state").over(w).isNull()
        | (F.col("state") != F.lag("state").over(w)),
    ).filter(F.col("_chg"))
    return starts.select(
        F.col("entity").alias(entity_col),
        "state",
        F.col("_us").alias("valid_from_us"),
        F.lead("_us").over(w).alias("valid_to_us"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )
