"""CDC batch apply: MERGE a keyed changeset into a base table.

The write-side complement of the table-maintenance family (`snapshot`
churn readout, `layout` compaction/Z-order, `scd` history): a change-data
capture feed arrives as (op, key, payload) rows — 'U'pdate, 'D'elete,
'I'nsert — and must land on a 10^12-row base table with MERGE semantics
(Iceberg/Delta `MERGE INTO`): matched D rows vanish, matched U rows take
the changeset payload, unmatched I rows append; a U without a base match
and an I that already exists are no-ops (strict-op semantics — the
changeset producer, not the sink, resolves upserts).

Scale shape — the base table is touched by exactly ONE wide op:

- the D∪U key set is a changeset-sized relation, BROADCAST into a
  left-anti join against the base (no base shuffle);
- U rows that actually match are found by left-semi joining the SMALL
  changeset against the base's projected key column (the base side of
  that exchange is one column wide);
- I rows key-anti-join the same projection;
- survivors ∪ matched-U ∪ fresh-I is a union, not a join.

Every row in the result carries an `_action` tag (kept / updated /
inserted) so per-partition audit counts fall out of the same pass that
wrote the data — the lineage/metrics row the north rule checkpoints per
partition.

Reference analogue: none (training-data pipeline extension, task spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_cdc_batch"]


def apply_cdc_batch(
    base: DataFrame,
    changes: DataFrame,
    *,
    key_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply one (op, key, payload) changeset batch to `base` with MERGE
    semantics; returns the merged table plus an `_action` column
    ('kept' | 'updated' | 'inserted').

    `changes` must carry `op_col` ∈ {'U','D','I'} and the same payload
    columns as `base`. Within one batch each key may appear under at most
    one op (a producer emitting U+D for one key should collapse upstream;
    if both arrive, D wins — the U row's key is still in the touched set,
    so the base row is dropped and the U row finds no match to revive it
    ... it WOULD still match the pre-delete base, so we exclude D keys
    from the U set explicitly to keep D-wins)."""
    payload = base.columns
    d_keys = (
        changes.where(F.col(op_col) == "D").select(key_col).distinct()
    )
    u_rows = (
        changes.where(F.col(op_col) == "U")
        .join(d_keys, key_col, "left_anti")  # D wins over U on the same key
        .select(*payload)
    )
    i_rows = changes.where(F.col(op_col) == "I").select(*payload)

    touched = d_keys.unionByName(u_rows.select(key_col)).distinct()
    base_keys = base.select(key_col)

    kept = base.join(F.broadcast(touched), key_col, "left_anti")
    updated = u_rows.join(base_keys, key_col, "left_semi")
    inserted = i_rows.join(base_keys, key_col, "left_anti")

    return (
        kept.withColumn("_action", F.lit("kept"))
        .unionByName(updated.withColumn("_action", F.lit("updated")))
        .unionByName(inserted.withColumn("_action", F.lit("inserted")))
    )
