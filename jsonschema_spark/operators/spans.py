"""Span-axis operators: salted repartition, span-sequence equality vs a
reference table, explode helpers (north rule per-row invariant: span-sequence
equality on (kind, text, media_ref, order)).

Skew note: media-heavy documents make *span work* (explode / per-span UDFs)
skewed even when doc_id itself is uniform. ``salted_repartition`` spreads rows
by ``xxhash64(doc_id, salt)`` so one straggler partition doesn't gate the
stage (SURVEY §4.2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_repartition", "span_sequence_mismatches", "explode_spans", "span_length_stats"]


def salted_repartition(df: DataFrame, key: str, num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Repartition by hash(key, salt) — explicit, north-rule mandated.

    The salt is a ROW-CONTENT hash (all columns), not
    monotonically_increasing_id: a task retry after a lost shuffle re-salts
    every row identically, so the shuffle is deterministic end-to-end."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    out = salted.repartition(num_partitions, F.xxhash64(F.col(key), F.col("__salt")))
    return out.drop("__salt")


def explode_spans(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """(doc_id, pos, kind, text, media_ref, offset) — one row per span."""
    return df.select(
        "doc_id", F.posexplode(spans_col).alias("pos", "span")
    ).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def _span_key(col: str) -> Column:
    # order-sensitive comparable projection of a spans array on
    # (kind, text, media_ref, order) — offset intentionally excluded
    return F.transform(
        F.col(col),
        lambda s: F.struct(s["kind"].alias("kind"), s["text"].alias("text"), s["media_ref"].alias("media_ref")),
    )


def span_sequence_mismatches(
    docs: DataFrame,
    reference: DataFrame,
    *,
    detail: bool = False,
) -> DataFrame:
    """Docs whose span sequence differs from the reference's for the same doc_id.

    Fast path: whole-array struct equality after projecting to
    (kind, text, media_ref) — one sort-merge/broadcast join on doc_id, no
    explode. ``detail=True`` switches to posexplode + join on (doc_id, pos)
    and reports the first differing position per doc.
    """
    if not detail:
        left = docs.select("doc_id", _span_key("spans").alias("seq"))
        right = reference.select("doc_id", _span_key("spans").alias("ref_seq"))
        joined = left.join(right, "doc_id", "inner")
        return joined.filter(~(F.col("seq") == F.col("ref_seq"))).select(
            "doc_id",
            F.size("seq").alias("n_spans"),
            F.size("ref_seq").alias("n_ref_spans"),
        )

    l = explode_spans(docs).withColumnRenamed("kind", "kind_l").withColumnRenamed(
        "text", "text_l"
    ).withColumnRenamed("media_ref", "media_ref_l").drop("offset")
    r = explode_spans(reference).withColumnRenamed("kind", "kind_r").withColumnRenamed(
        "text", "text_r"
    ).withColumnRenamed("media_ref", "media_ref_r").drop("offset")
    j = l.join(r, ["doc_id", "pos"], "full_outer")
    diff = j.filter(
        ~(
            F.col("kind_l").eqNullSafe(F.col("kind_r"))
            & F.col("text_l").eqNullSafe(F.col("text_r"))
            & F.col("media_ref_l").eqNullSafe(F.col("media_ref_r"))
        )
    )
    return diff.groupBy("doc_id").agg(F.min("pos").alias("first_mismatch_pos"), F.count(F.lit(1)).alias("n_mismatched_spans"))


def span_length_stats(docs: DataFrame) -> DataFrame:
    """Per-doc span-count distribution inputs for the KS drift check."""
    return docs.select("doc_id", F.size("spans").alias("span_count"))
