"""Streaming drift (stream_psi / stream_ks): per-window statistics against a
frozen baseline must match a hand-computed batch evaluation of the same
formula on the same rows, and the plan must stay a single streaming
aggregation (watermark-bounded state)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.streaming import stream_ks, stream_psi

_EPS = 1e-6


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("drift_landing"))
    rows = []
    # two 1-minute windows with different category mixes and value ramps
    for i in range(300):
        cat = ["click", "view", "purchase"][i % 3]
        rows.append(("2024-01-01 00:00:%02d.%03d" % (i % 60, i), cat, float(i % 100)))
    for i in range(300):
        cat = ["click", "click", "weird"][i % 3]  # drifted mix + novel category
        rows.append(("2024-01-01 00:01:%02d.%03d" % (i % 60, i), cat, float(50 + i % 100)))
    # sentinel far past both windows: with watermark "0 seconds" it pushes the
    # event-time watermark beyond their end, so append mode emits them in the
    # trailing no-data micro-batch; its own window stays open and never emits
    rows.append(("2024-01-01 00:10:00.000", "click", 0.0))
    df = spark.createDataFrame(rows, "ts string, cat string, val double").select(
        F.col("ts").cast("timestamp").alias("ts"), "cat", "val"
    )
    df.write.mode("overwrite").parquet(base)
    return base, df.schema


def _run_stream(spark, tmp_path, out_df, name):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").collect()


BASELINE = {"click": 1 / 3, "view": 1 / 3, "purchase": 1 / 3}


def _psi_expected(counts: dict[str, int], n: int) -> float:
    total = 0.0
    other = n - sum(counts.get(k, 0) for k in BASELINE)
    for k, p in BASELINE.items():
        q = max(counts.get(k, 0) / n, _EPS)
        total += (p - q) * math.log(p / q)
    q = max(other / n, _EPS)
    total += (_EPS - q) * math.log(_EPS / q)
    return total


def test_stream_psi_matches_formula(spark, landing, tmp_path):
    base, ddl = landing
    stream = spark.readStream.schema(ddl).parquet(base)
    out = stream_psi(
        stream, "ts", "cat", BASELINE, window_duration="1 minute", watermark="0 seconds"
    )
    rows = sorted(_run_stream(spark, tmp_path, out, "psi_stream"), key=lambda r: r["window"])
    assert len(rows) == 2
    batch = spark.read.parquet(base)
    for r in rows:
        w = batch.filter(
            (F.col("ts") >= r["window"]["start"]) & (F.col("ts") < r["window"]["end"])
        )
        counts = {x["cat"]: x["count"] for x in w.groupBy("cat").count().collect()}
        n = sum(counts.values())
        assert r["doc_count"] == n
        assert r["psi"] == pytest.approx(_psi_expected(counts, n), rel=1e-9)
    # window 2 (drifted + novel category) must alarm far above window 1
    assert rows[1]["psi"] > rows[0]["psi"] + 1.0


def test_stream_ks_matches_formula(spark, landing, tmp_path):
    base, ddl = landing
    edges = [24.5, 49.5, 74.5, 99.5]
    cum = [0.25, 0.5, 0.75, 1.0]  # baseline: uniform on 0..99
    stream = spark.readStream.schema(ddl).parquet(base)
    out = stream_ks(
        stream, "ts", "val", edges, cum, window_duration="1 minute", watermark="0 seconds"
    )
    rows = sorted(_run_stream(spark, tmp_path, out, "ks_stream"), key=lambda r: r["window"])
    assert len(rows) == 2
    batch = spark.read.parquet(base)
    for r in rows:
        w = batch.filter(
            (F.col("ts") >= r["window"]["start"]) & (F.col("ts") < r["window"]["end"])
        ).collect()
        vals = [x["val"] for x in w]
        n = len(vals)
        want = max(abs(sum(v <= e for v in vals) / n - c) for e, c in zip(edges, cum))
        assert r["doc_count"] == n
        assert r["ks"] == pytest.approx(want, rel=1e-9)
    # uniform window ~0; shifted window drifts
    assert rows[0]["ks"] < 0.05 < rows[1]["ks"]


def test_stream_psi_single_stateful_aggregation(spark, landing):
    base, ddl = landing
    stream = spark.readStream.schema(ddl).parquet(base)
    out = stream_psi(stream, "ts", "cat", BASELINE)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("Aggregate") == 1  # ONE stateful aggregation, no chain
    assert "Join" not in plan


def test_stream_ks_validates_inputs(spark, landing):
    base, ddl = landing
    stream = spark.readStream.schema(ddl).parquet(base)
    with pytest.raises(ValueError):
        stream_ks(stream, "ts", "val", [2.0, 1.0], [0.5, 1.0])
    with pytest.raises(ValueError):
        stream_ks(stream, "ts", "val", [], [])
    with pytest.raises(ValueError):
        stream_psi(stream, "ts", "cat", {"a": 0.0})


def _js_expected(counts: dict[str, int], n: int) -> float:
    def term(p, q):
        p, q = max(p, _EPS), max(q, _EPS)
        m = (p + q) / 2
        return 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)

    other = n - sum(counts.get(k, 0) for k in BASELINE)
    total = term(_EPS, other / n)
    for k, p in BASELINE.items():
        total += term(p, counts.get(k, 0) / n)
    return total


def test_stream_js_matches_formula_and_stays_bounded(spark, landing, tmp_path):
    from jsonschema_spark.streaming import stream_js

    base, ddl = landing
    stream = spark.readStream.schema(ddl).parquet(base)
    out = stream_js(
        stream, "ts", "cat", BASELINE, window_duration="1 minute", watermark="0 seconds"
    )
    rows = sorted(_run_stream(spark, tmp_path, out, "js_stream"), key=lambda r: r["window"])
    assert len(rows) == 2
    batch = spark.read.parquet(base)
    for r in rows:
        w = batch.filter(
            (F.col("ts") >= r["window"]["start"]) & (F.col("ts") < r["window"]["end"])
        )
        counts = {x["cat"]: x["count"] for x in w.groupBy("cat").count().collect()}
        n = sum(counts.values())
        assert r["doc_count"] == n
        assert r["js"] == pytest.approx(_js_expected(counts, n), rel=1e-9)
        assert r["js"] <= math.log(2) + 1e-9  # bounded even with the novel category
    assert rows[1]["js"] > rows[0]["js"]
    # single stateful aggregation, same contract as stream_psi
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("Aggregate") == 1
