"""Streaming MinHash-LSH near-dup candidates (streaming/neardup_stream.py).

Pins the three contracts the docstring claims:
  1. stream pairs == batch `lsh_candidate_pairs` pairs on the same corpus
     (same hash family, same bucket key, same estimator);
  2. state persists ACROSS micro-batches — a duplicate arriving later still
     pairs with the earlier doc (parquet sink; memory sink can't recover
     stateful checkpoints);
  3. the per-bucket FIFO cap bounds state: with max_bucket=1 only adjacent
     arrivals pair, never first-with-third.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import lsh_candidate_pairs, minhash_signature
from jsonschema_spark.streaming.neardup_stream import stream_near_dup_candidates

_BASE = (
    "the quick brown fox jumps over the lazy dog while the calm river "
    "flows past the old stone bridge near the quiet village square"
)
DOCS = [
    ("d1", _BASE),
    ("d2", _BASE),  # exact dup of d1
    ("d3", _BASE + " at dawn"),  # near dup (tail edit only)
    ("d4", "completely different text about spark streaming state"),
    ("d5", "another unrelated document with its own vocabulary"),
]


def _write_docs(spark, path, rows):
    (
        spark.createDataFrame(rows, "id string, text string")
        .withColumn("ingest_ts", F.current_timestamp())
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path).schema


def _run_stream(spark, land, schema, ck, sink, **kw):
    stream = spark.readStream.schema(schema).parquet(land)
    q = (
        stream_near_dup_candidates(stream, **kw)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _pairs(spark, sink):
    try:
        df = spark.read.parquet(sink)
    except Exception:
        return set()
    return {
        (r["id_a"], r["id_b"], round(r["est_sim"], 9))
        for r in df.select("id_a", "id_b", "est_sim").distinct().collect()
    }


def test_stream_pairs_match_batch(spark, tmp_path):
    land = str(tmp_path / "land")
    schema = _write_docs(spark, land, DOCS)

    _run_stream(
        spark,
        land,
        schema,
        str(tmp_path / "ck"),
        str(tmp_path / "sink"),
        k=8,
        bands=4,
        rows_per_band=2,
        min_est_sim=0.0,
    )
    got = {(a, b, e) for a, b, e in _pairs(spark, str(tmp_path / "sink"))}

    sig = minhash_signature(spark.read.parquet(land), "id", "text", k=8)
    want = {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 9))
        for r in lsh_candidate_pairs(sig, bands=4, rows_per_band=2).collect()
    }
    assert got == want and len(want) >= 2  # (d1,d2) exact + (d1|d2, d3) near


def test_state_persists_across_micro_batches(spark, tmp_path):
    land, ck, sink = (str(tmp_path / p) for p in ("land", "ck", "sink"))
    schema = _write_docs(spark, land, [DOCS[0], DOCS[3]])
    _run_stream(spark, land, schema, ck, sink, min_est_sim=0.5)
    assert _pairs(spark, sink) == set()  # nothing similar yet

    # second micro-batch: d2 (exact dup of d1) lands later
    (
        spark.createDataFrame([DOCS[1]], "id string, text string")
        .withColumn("ingest_ts", F.current_timestamp())
        .write.mode("append")
        .parquet(land)
    )
    _run_stream(spark, land, schema, ck, sink, min_est_sim=0.5)
    pair_ids = {(a, b) for a, b, _ in _pairs(spark, sink)}
    assert ("d1", "d2") in pair_ids


def test_bucket_cap_bounds_state_fifo(spark, tmp_path):
    land, ck, sink = (str(tmp_path / p) for p in ("land", "ck", "sink"))
    # three identical docs, one micro-batch, cap=1: processed in id order,
    # so x2 pairs with x1, x3 pairs with x2 (x1 evicted) — never (x1, x3)
    text = DOCS[0][1]
    schema = _write_docs(spark, land, [("x1", text), ("x2", text), ("x3", text)])
    _run_stream(spark, land, schema, ck, sink, min_est_sim=0.99, max_bucket=1)
    pair_ids = {(a, b) for a, b, _ in _pairs(spark, sink)}
    assert pair_ids == {("x1", "x2"), ("x2", "x3")}


def test_band_rows_contract_enforced(spark):
    stream = (
        spark.readStream.format("rate").load()
        .select(F.lit("a").alias("id"), F.lit("t").alias("text"),
                F.col("timestamp").alias("ingest_ts"))
    )
    with pytest.raises(ValueError):
        stream_near_dup_candidates(stream, k=8, bands=3, rows_per_band=2)
