"""Bloom-filter prefilter for incremental corpus dedup — the scale path
`dedup_against` (operators/dedup.py) documents but previously left to the
deployment: before joining a new crawl batch against the existing corpus's
exact-hash relation, test every new document against a Bloom filter BUILT
FROM the reference hashes, so the verification join's probe side shrinks
from |new| to |new|·(dup_rate + false_positive_rate).

Everything is engine-portable column math (no driver-side
``DataFrameStatFunctions.bloomFilter`` object, no Python UDF), so a DuckDB
oracle replays the filter bit-for-bit:

- hashes: two independent 60/48-bit integers from the md5 hex of the
  normalized text (the same `0x`-prefix trick as the MinHash family);
- positions: Kirsch-Mitzenmacher double hashing pos_i = (h1 + i·(2·h2+1))
  mod n_bits, i < k — the step is forced odd so it is coprime with the
  power-of-two n_bits and walks all slots (h2 is 48-bit so i·step stays
  far under 2^63 for any sane k);
- bitset: 32 bits per BIGINT word (bit 63 is avoided entirely — DuckDB
  raises on 1<<63 and Spark's shiftleft wraps, so 32-bit words keep every
  intermediate positive and exact in both engines and in doubles);
  built with ONE explode + map-side-combining `bit_or` groupBy, bounded at
  n_bits/32 rows regardless of reference-corpus size;
- membership: explode the k probe positions, join the words relation on
  word index, AND the k bit tests back together per document.

Scale shape (10^12 refs): the words relation is broadcast while the
filter fits the broadcast budget (n_bits ≤ broadcast_bits, the normal
case — a Bloom filter's whole point is to be RAM-resident); past that the
probe join co-partitions on word index, which is still a 16 B/row
exchange of (id, widx, contribution) probes — never text, never the full
reference relation. The reference-side build is a one-per-snapshot job
whose output (n_bits/32 rows) is reused across every ingest batch.

False positives are inherent and SURFACED, not hidden: `report=True`
returns the per-document bloom verdict alongside the exact-join verdict,
so the false-positive rate is measurable in production (and the DuckDB
oracle pins the exact same bit pattern). False negatives are impossible —
a test asserts every true duplicate passes the filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import normalize_text

__all__ = [
    "bloom_positions",
    "bloom_words",
    "bloom_probe",
    "bloom_dedup_against",
]

_WORD_BITS = 32  # BIGINT words hold 32 bits: portable, sign-safe, double-exact


def bloom_positions(key: Column, n_bits: int, k: int) -> Column:
    """array<long> of k Bloom slot positions for a string key.

    n_bits must be a power of two (asserted) so the odd double-hashing step
    is coprime with it. DuckDB replay:
    ``(CAST('0x'||substr(md5(key),1,15) AS BIGINT)
       + i*(2*CAST('0x'||substr(md5(key),17,12) AS BIGINT)+1)) % n_bits``.
    """
    if n_bits & (n_bits - 1):
        raise ValueError(f"n_bits must be a power of two, got {n_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1,16], got {k}")
    h = F.md5(key)
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    step = F.conv(F.substring(h, 17, 12), 16, 10).cast("long") * 2 + 1
    return F.array(*[(h1 + F.lit(i) * step) % F.lit(n_bits) for i in range(k)])


def _contribution(pos: Column) -> Column:
    # 2^(pos mod 32) — exact in doubles up to 2^52, so the cast is lossless.
    return F.pow(F.lit(2.0), pos % _WORD_BITS).cast("long")


def bloom_words(ref: DataFrame, key: Column, *, n_bits: int, k: int) -> DataFrame:
    """(widx:long, word:long) — the Bloom bitset as a relation, ≤ n_bits/32
    rows. One explode + one map-side-combining bit_or aggregation; the only
    exchange carries (widx, partial-word) pairs bounded by the bitset size,
    never by the reference corpus size."""
    pos = F.explode(bloom_positions(key, n_bits, k)).alias("pos")
    return (
        ref.select(pos)
        .groupBy((F.col("pos") / _WORD_BITS).cast("long").alias("widx"))
        .agg(F.bit_or(_contribution(F.col("pos"))).alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    key: Column,
    words: DataFrame,
    id_col: str,
    *,
    n_bits: int,
    k: int,
    broadcast_bits: int = 1 << 26,
) -> DataFrame:
    """(id, bloom_pass:boolean) — one row per input row. Explodes the k
    probe positions, left-joins the words relation on word index (broadcast
    while the bitset fits ``broadcast_bits``), and requires all k bits set."""
    probes = df.select(F.col(id_col).alias("id"), F.explode(bloom_positions(key, n_bits, k)).alias("pos")).select(
        "id",
        (F.col("pos") / _WORD_BITS).cast("long").alias("widx"),
        _contribution(F.col("pos")).alias("contrib"),
    )
    w = F.broadcast(words) if n_bits <= broadcast_bits else words
    hit = (F.col("word").isNotNull() & (F.col("word").bitwiseAND(F.col("contrib")) != 0)).cast("int")
    return (
        probes.join(w, "widx", "left")
        .select("id", hit.alias("hit"))
        .groupBy("id")
        .agg((F.sum("hit") == F.lit(k)).alias("bloom_pass"))
    )


def bloom_dedup_against(
    new_df: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_bits: int = 1 << 20,
    k: int = 5,
    report: bool = False,
) -> DataFrame:
    """Exact incremental dedup of a new batch against an existing corpus,
    with a Bloom prefilter in front of the verification join. The OUTPUT is
    identical to the plain exact-hash anti-join (`dedup_against` pass 1) —
    the filter only shrinks the join's probe side; bloom-positive
    non-duplicates are weeded out by the exact verify.

    report=False: the surviving rows of ``new_df``, unchanged.
    report=True: (id, bloom_pass, status ∈ {kept, exact_dup}, match_id)
    where match_id is the smallest duplicate reference id (NULL when kept);
    bloom_pass=true & status=kept rows ARE the measured false positives.
    """
    key = normalize_text(F.col(text_col))  # bloom_positions md5s the key itself
    norm = F.md5(key)
    words = bloom_words(ref_df, key, n_bits=n_bits, k=k)
    verdict = bloom_probe(new_df, key, words, id_col, n_bits=n_bits, k=k)

    hashed = new_df.select(F.col(id_col).alias("id"), norm.alias("text_hash"))
    ref_hashes = (
        ref_df.select(norm.alias("text_hash"), F.col(id_col).alias("__rid"))
        .groupBy("text_hash")
        .agg(F.min("__rid").alias("match_id"))
    )
    # the verification join probes ONLY bloom-positive docs — that shrink is
    # the operator's entire point at scale
    candidates = hashed.join(verdict.filter(F.col("bloom_pass")).select("id"), "id")
    exact_hits = candidates.join(ref_hashes, "text_hash").select("id", "match_id")

    if not report:
        return new_df.join(
            exact_hits.select(F.col("id").alias(id_col)), id_col, "left_anti"
        )
    return verdict.join(exact_hits, "id", "left").select(
        "id",
        "bloom_pass",
        F.when(F.col("match_id").isNotNull(), F.lit("exact_dup"))
        .otherwise(F.lit("kept"))
        .alias("status"),
        "match_id",
    )
