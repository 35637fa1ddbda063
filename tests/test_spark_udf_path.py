"""Distributed dynamic-JSON path: the Arrow-batched UDF must reproduce the
scalar core's verdicts — proven over the full official suite run AS A SPARK JOB
(one row per suite test; schema varies per row)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.functions.udf import validate_json_column, validate_pairs_udf
from tests.suite_loader import CORE_NO_REMOTE_FILES, iter_tests, suite_available

pytestmark = pytest.mark.skipif(not suite_available(), reason="suite not vendored")


def test_suite_as_spark_job(spark):
    rows = []
    for filename in CORE_NO_REMOTE_FILES:
        for case_desc, test_desc, schema, data, expected in iter_tests(filename):
            raw = [c for c in open_raw(filename) if c["description"] == case_desc]
            rows.append(
                (
                    filename,
                    f"{case_desc} / {test_desc}",
                    json.dumps(raw[0]["schema"]),
                    find_data(raw[0], test_desc),
                    expected,
                )
            )
    df = spark.createDataFrame(
        rows, "file string, test string, schema_json string, data_json string, expected boolean"
    )
    got = df.withColumn("valid", validate_pairs_udf()(F.col("schema_json"), F.col("data_json")))
    bad = got.filter(F.col("valid") != F.col("expected")).select("file", "test").collect()
    assert not bad, f"{len(bad)} disagreements, e.g. {bad[:10]}"


_raw_cache: dict[str, list] = {}


def open_raw(filename):
    import os

    from tests.suite_loader import DRAFT_DIR

    if filename not in _raw_cache:
        with open(os.path.join(DRAFT_DIR, filename)) as f:
            _raw_cache[filename] = json.load(f)
    return _raw_cache[filename]


def find_data(case, test_desc):
    for t in case["tests"]:
        if t["description"] == test_desc:
            return json.dumps(t["data"])
    raise KeyError(test_desc)


def test_validate_json_column(spark):
    schema = {
        "type": "object",
        "required": ["name"],
        "properties": {
            "name": {"type": "string", "minLength": 2},
            "age": {"type": "integer", "minimum": 0},
        },
    }
    df = spark.createDataFrame(
        [
            ('{"name": "ada", "age": 36}',),
            ('{"name": "x"}',),
            ('{"age": -1}',),
        ],
        "doc string",
    )
    out = validate_json_column(df, "doc", schema).select("valid", "violations").collect()
    assert [r.valid for r in out] == [True, False, False]
    codes = {v["code"] for v in out[2]["violations"]}
    assert {"missing_required_property", "value_below_minimum"} <= codes
