"""Document ingestion: raw encodings → the typed docs table.

The reference accepts three input encodings with one semantics (raw JSON
bytes / parsed maps / structs — validate.go:11-55); our analogues:

- typed parquet/Iceberg columns (nothing to do);
- JSON lines / JSON string columns → `from_json` with the exact docs DDL
  (JVM Jackson parse; numbers land in typed columns, never inferred through
  float — the schema IS the number contract);
- `contentEncoding: base64` payloads → `F.unbase64` (compiler.go:319-322
  content decoders).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschema_spark.synth import DOCS_DDL

__all__ = ["read_docs_jsonl", "read_docs_json", "decode_content"]


def read_docs_jsonl(spark: SparkSession, path: str, *, ddl: str = DOCS_DDL) -> DataFrame:
    """JSON-lines files → typed docs rows (malformed lines become NULL-field
    rows the validator then flags; use PERMISSIVE semantics, never abort)."""
    raw = spark.read.text(path)
    parsed = raw.select(F.from_json(F.col("value"), ddl).alias("d"))
    return parsed.select("d.*")


def read_docs_json(df: DataFrame, json_col: str, *, ddl: str = DOCS_DDL) -> DataFrame:
    """A raw-JSON string column inside an existing table → typed doc struct."""
    return df.withColumn("_doc", F.from_json(F.col(json_col), ddl))


def decode_content(col: Column, encoding: str) -> Column:
    """contentEncoding decoder (reference: compiler.go:319-322,364)."""
    if encoding == "base64":
        return F.unbase64(col)
    raise ValueError(f"unsupported contentEncoding: {encoding}")
