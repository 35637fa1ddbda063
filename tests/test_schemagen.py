"""schemagen CLI: parquet footer → JSON Schema (cmd/schemagen analogue)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_spark.schemagen import generate_schema, main


def _write(path, table, **kw):
    pq.write_table(table, path, **kw)
    return str(path)


def test_required_tracks_observed_nulls(tmp_path):
    t = pa.table(
        {
            "a": pa.array([1, 2, 3], pa.int64()),
            "b": pa.array(["x", None, "z"], pa.string()),
        }
    )
    p = _write(tmp_path / "t.parquet", t)
    s = generate_schema(p)
    assert s["required"] == ["a"]  # b has an observed null
    assert s["properties"]["b"] == {"type": "string"}
    s2 = generate_schema(p, infer_required=False)
    assert "required" not in s2  # arrow marks both nullable


def test_null_in_any_row_group_disqualifies(tmp_path):
    t = pa.table({"a": pa.array([1, None] + [2] * 8, pa.int64())})
    p = _write(tmp_path / "t.parquet", t, row_group_size=5)
    assert pq.ParquetFile(p).metadata.num_row_groups == 2
    assert "required" not in generate_schema(p)


def test_directory_input_merges_parts(tmp_path):
    d = tmp_path / "tbl"
    d.mkdir()
    _write(d / "part-0.parquet", pa.table({"a": pa.array([1], pa.int64())}))
    _write(d / "part-1.parquet", pa.table({"a": pa.array([None], pa.int64())}))
    s = generate_schema(str(d))
    assert "required" not in s  # null observed in one part
    assert s["properties"]["a"]["type"] == "integer"


def test_part_schema_mismatch_errors(tmp_path):
    d = tmp_path / "tbl"
    d.mkdir()
    _write(d / "part-0.parquet", pa.table({"a": pa.array([1], pa.int64())}))
    _write(d / "part-1.parquet", pa.table({"a": pa.array(["x"], pa.string())}))
    with pytest.raises(ValueError, match="mismatch"):
        generate_schema(str(d))


def test_cli_write_skip_force(tmp_path, capsys):
    p = _write(tmp_path / "t.parquet", pa.table({"a": pa.array([1], pa.int64())}))
    dest = str(tmp_path / "t.schema.json")
    assert main([p]) == 0 and os.path.exists(dest)
    assert main([p]) == 0  # identical content → up-to-date skip
    with open(dest, "w") as fh:
        fh.write("{}")
    assert main([p]) == 1  # exists with different content, no --force
    assert main([p, "--force"]) == 0
    assert json.load(open(dest))["properties"]["a"]["type"] == "integer"


def test_cli_id_and_dialect_stamp(tmp_path, capsys):
    p = _write(tmp_path / "t.parquet", pa.table({"a": pa.array([1], pa.int64())}))
    assert main([p, "--dry-run", "--id", "https://example.com/t"]) == 0
    s = json.loads(capsys.readouterr().out)
    assert s["$id"] == "https://example.com/t"
    assert s["$schema"].endswith("2020-12/schema")


def test_generated_schema_validates_its_own_table(spark):
    """End-to-end: the schema generated for documents.parquet accepts every
    row of documents.parquet under the structured-plan compiler."""
    from pyspark.sql import functions as F

    from jsonschema_spark.plans.columns import validate_dataframe

    schema = generate_schema("/root/testdata/sf0.001/documents.parquet")
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = validate_dataframe(df, schema)
    assert out.filter(~F.col("valid")).count() == 0
