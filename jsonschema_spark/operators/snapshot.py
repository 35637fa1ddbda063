"""Snapshot-diff incremental validation and partition-skew diagnostics.

A 100 TB interleaved-docs table does not get fully re-validated on every
snapshot: between two table snapshots only a sliver of documents are new or
rewritten, and re-running the whole constraint plan over the other 99% is
the single largest avoidable cost in a recurring validation job. The
operator here is the batch analogue of an Iceberg incremental scan:

  1. digest the CURRENT content of every doc with a cross-engine md5 fold
     over the span sequence (order-sensitive, NULL-sentineled — same
     canonicalization contract as ``spans.span_sequence_digest`` but
     replayable in any SQL engine, so the stored digest survives an engine
     migration);
  2. join against the BASE snapshot's (doc_id, digest, valid) manifest —
     at production scale both sides are bucketed by doc_id so this is a
     co-located sort-merge join, never a broadcast;
  3. docs whose digest is unchanged REUSE the stored verdict (the
     validation expression is inside the non-taken conditional branch, so
     whole-stage codegen never evaluates it for them); new/changed docs
     re-evaluate.

The output doubles as the NEXT snapshot's manifest: (doc_id, digest,
status, valid) — write it back beside the snapshot and the job is
incremental forever. Reference analogue: none (the reference validates
whatever documents it is handed; incrementality is a table-format-era
extension the north rule's "resumable from checkpoint" clause points at).

``bucket_skew_stats`` is the companion diagnostic for the north rule's
"skew handled explicitly": it measures how unevenly docs / spans / payload
bytes land across the same hash buckets the runner partitions by, BEFORE
you pick a salting factor. The md5-derived bucket (not xxhash64) keeps the
report replayable in the DuckDB oracle; the runner's actual partitioner
(xxhash64) distributes at least as uniformly for any key set where md5
does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "content_digest",
    "snapshot_diff_validate",
    "bucket_skew_stats",
    "snapshot_churn_stats",
]

# ASCII unit/record separators: cannot appear in the synthetic corpus and
# survive ``||`` concatenation identically in Spark and DuckDB. NUL is
# avoided on purpose — some engines truncate VARCHARs at NUL.
_FIELD_SEP = "\x1f"
_SPAN_SEP = "\x1e"
_NULL_SENTINEL = "\x11"


def content_digest(spans_col: Column | str) -> Column:
    """Cross-engine md5 digest of a span sequence (order-sensitive).

    Each span folds to ``kind US text US media_ref US offset`` with NULLs
    mapped to a DC1 sentinel, spans joined by RS, then one md5. Unlike
    ``span_sequence_digest`` (xxhash64, JVM-only, cheapest for in-job
    compares) this digest is portable: DuckDB replays it as
    ``md5(array_to_string(list_transform(...), chr(30))))``, so a manifest
    written by this engine can be verified or extended by another. offset
    IS included — a rewritten doc with identical text but shifted offsets
    must re-validate (offsets are part of what the constraint plan checks).
    A NULL spans array digests to NULL (never compares equal → always
    revalidated), matching whole-array equality semantics.
    """
    col = F.col(spans_col) if isinstance(spans_col, str) else spans_col
    per_span = F.transform(
        col,
        lambda s: F.concat_ws(
            _FIELD_SEP,
            F.coalesce(s["kind"], F.lit(_NULL_SENTINEL)),
            F.coalesce(s["text"], F.lit(_NULL_SENTINEL)),
            F.coalesce(s["media_ref"], F.lit(_NULL_SENTINEL)),
            F.coalesce(s["offset"].cast("string"), F.lit(_NULL_SENTINEL)),
        ),
    )
    return F.when(col.isNotNull(), F.md5(F.array_join(per_span, _SPAN_SEP)))


def snapshot_diff_validate(
    current: DataFrame,
    base: DataFrame,
    valid_expr: Column,
    *,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
    digest_col: str = "digest",
    base_valid_col: str = "valid",
) -> DataFrame:
    """Validate only the docs that changed since the base snapshot manifest.

    current:  (doc_id, spans, ...) — the table as of the new snapshot.
    base:     (doc_id, digest, valid) — the manifest the previous run wrote.
    valid_expr: the verdict Column to evaluate over `current`'s columns for
        new/changed docs (any of the repo's compiled validation plans).

    Returns (doc_id, digest, status, valid) where status ∈
    {'new','unchanged','changed'} — the next snapshot's manifest.

    Plan shape: one narrow digest projection on each side, then a single
    left join on doc_id. At scale both inputs are doc_id-bucketed table
    scans, so the join co-locates without a shuffle of the big side; the
    validation expression sits in the `otherwise` branch of a CASE on
    digest equality, so codegen skips it row-wise for the unchanged
    majority — the recurring cost is O(changed docs), not O(table).
    """
    cur = current.withColumn(digest_col, content_digest(spans_col))
    b = base.select(
        F.col(doc_id_col).alias("__b_id"),
        F.col(digest_col).alias("__b_digest"),
        F.col(base_valid_col).alias("__b_valid"),
    )
    joined = cur.join(b, cur[doc_id_col] == b["__b_id"], "left")
    unchanged = F.col("__b_digest").isNotNull() & (
        F.col(digest_col) == F.col("__b_digest")
    )
    status = (
        F.when(F.col("__b_digest").isNull(), F.lit("new"))
        .when(unchanged, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    valid = F.when(unchanged, F.col("__b_valid")).otherwise(valid_expr)
    return joined.select(
        F.col(doc_id_col),
        F.col(digest_col),
        status.alias("status"),
        valid.alias("valid"),
    )


def bucket_skew_stats(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
    n_buckets: int = 32,
) -> DataFrame:
    """Per-hash-bucket load report for the runner's doc_id partitioning.

    For each of ``n_buckets`` md5-derived buckets: document count, total
    span count, and total text payload bytes (media-heavy docs carry few
    text bytes but many spans — the two skew axes the north rule calls out
    diverge, which is exactly what this report shows). Every bucket appears
    even when empty (a 0-doc bucket is the strongest possible skew signal).

    Output: (bucket, n_docs, n_spans, text_bytes, doc_share, span_share)
    sorted by bucket — n_buckets rows total, one map-side-combining groupBy;
    the shares are computed from a window over those n_buckets rows, so the
    second pass is driver-trivial at any corpus size.
    """
    from pyspark.sql.window import Window

    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(doc_id_col).cast("string")), 1, 15), 16, 10).cast(
            "bigint"
        ),
        F.lit(n_buckets),
    ).cast("int")
    per_doc = docs.select(
        bucket.alias("bucket"),
        F.size(spans_col).alias("__n_spans"),
        F.aggregate(
            F.transform(spans_col, lambda s: F.coalesce(F.length(s["text"]), F.lit(0))),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("__text_bytes"),
    )
    agged = per_doc.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n_spans").alias("n_spans"),
        F.sum("__text_bytes").alias("text_bytes"),
    )
    spark = docs.sparkSession
    all_buckets = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    filled = (
        all_buckets.join(agged, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("text_bytes", F.lit(0)).alias("text_bytes"),
        )
    )
    # nudge-then-floor 1e-6 snap (not round(): engines disagree on decimal
    # ties; bare floor() splits mathematically-on-grid values) — the repo's
    # standard cross-engine float canonicalization.
    def _snap(c: Column) -> Column:
        return F.floor(c * F.lit(1e6) + F.lit(1e-6)) / F.lit(1e6)

    w = Window.partitionBy()
    return (
        filled.select(
            "bucket",
            "n_docs",
            "n_spans",
            "text_bytes",
            _snap(
                F.col("n_docs") / F.greatest(F.sum("n_docs").over(w), F.lit(1))
            ).alias("doc_share"),
            _snap(
                F.col("n_spans") / F.greatest(F.sum("n_spans").over(w), F.lit(1))
            ).alias("span_share"),
        )
        .orderBy("bucket")
    )


def snapshot_churn_stats(
    current: DataFrame,
    base: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
    digest_col: str = "digest",
) -> DataFrame:
    """One-row churn summary between two snapshots: (n_added, n_removed,
    n_changed, n_unchanged) — the table-history readout an Iceberg-style
    snapshot log surfaces per commit, computed from content digests so a
    rewritten doc with identical content does NOT count as churn.

    `current` is the live table (doc_id, spans, ...); `base` is the prior
    manifest (doc_id, digest) — the same manifest snapshot_diff_validate
    consumes and emits, so the two operators share one stored artifact.

    Plan: digests reduce each side to ~50 B/row BEFORE the full-outer
    doc_id join (same exchange discipline as span_sequence_mismatches);
    one count-only aggregation after. At scale the join co-locates when
    both sides are bucketed on doc_id.
    """
    cur = current.select(
        F.col(doc_id_col).alias("__id"),
        content_digest(F.col(spans_col)).alias("__cur_dig"),
    )
    prev = base.select(
        F.col(doc_id_col).alias("__id"), F.col(digest_col).alias("__base_dig")
    )
    j = cur.join(prev, "__id", "full_outer")

    def _n(cond, name):
        # coalesce so an EMPTY diff reports zeros, not NULLs (sum over zero
        # rows is NULL in SQL semantics)
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).alias(name)

    return j.agg(
        _n(F.col("__base_dig").isNull(), "n_added"),
        _n(F.col("__cur_dig").isNull(), "n_removed"),
        _n(
            F.col("__cur_dig").isNotNull()
            & F.col("__base_dig").isNotNull()
            & (F.col("__cur_dig") != F.col("__base_dig")),
            "n_changed",
        ),
        _n(F.col("__cur_dig") == F.col("__base_dig"), "n_unchanged"),
    )
