"""Ingestion sources: JSON-lines → typed docs → same validation verdicts as
the parquet path (one semantics across encodings, reference validate.go:11-55)."""

import json

from pyspark.sql import functions as F

from jsonschema_spark.plans.columns import validate_dataframe
from jsonschema_spark.sources import TableIO, decode_content, read_docs_jsonl
from jsonschema_spark.synth import DOCS_SCHEMA, SynthConfig, make_docs


def test_jsonl_roundtrip_same_verdicts(spark, tmp_path):
    docs, _, _ = make_docs(spark, SynthConfig(n_docs=200, seed=21))
    jl = str(tmp_path / "docs.jsonl")
    with open(jl, "w") as f:
        for r in docs.toJSON().collect():
            f.write(r + "\n")

    typed = read_docs_jsonl(spark, jl)
    assert [f.name for f in typed.schema.fields] == ["doc_id", "spans"]

    via_json = {
        r["doc_id"]: r["valid"]
        for r in validate_dataframe(typed, DOCS_SCHEMA).select("doc_id", "valid").collect()
    }
    via_parquet = {
        r["doc_id"]: r["valid"]
        for r in validate_dataframe(docs, DOCS_SCHEMA).select("doc_id", "valid").collect()
    }
    assert via_json == via_parquet and len(via_json) > 0


def test_malformed_jsonl_rows_flagged_not_fatal(spark, tmp_path):
    jl = str(tmp_path / "bad.jsonl")
    with open(jl, "w") as f:
        f.write(json.dumps({"doc_id": "a", "spans": [{"kind": "text", "text": "hi", "offset": 0}]}) + "\n")
        f.write("this is not json\n")
    typed = read_docs_jsonl(spark, jl)
    v = validate_dataframe(typed, DOCS_SCHEMA).select("doc_id", "valid").collect()
    assert len(v) == 2  # malformed row survives as NULL-field row
    assert sum(1 for r in v if not r["valid"]) >= 1


def test_table_io_roundtrip(spark, tmp_path):
    io = TableIO(spark, "parquet")
    df = spark.range(10).withColumn("p", F.pmod("id", F.lit(2)))
    io.write(df, str(tmp_path / "t"), partition_by=["p"])
    got = io.read(str(tmp_path / "t"))
    assert got.count() == 10 and set(got.columns) == {"id", "p"}


def test_decode_content_base64(spark):
    df = spark.createDataFrame([("aGVsbG8=",)], "b string")
    out = df.select(decode_content(F.col("b"), "base64").cast("string").alias("s")).first()
    assert out["s"] == "hello"
