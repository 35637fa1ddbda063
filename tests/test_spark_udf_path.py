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


def test_multimodal_resize_and_frame_sampling(spark):
    """Task-spec multimodal ops: resize + frame-sample plumbing with injected
    deterministic fakes (codecs absent in this container; stubs must raise)."""
    import hashlib

    import pytest as _pytest

    from jsonschema_spark.operators.multimodal import fake_resizer, resize_images, sample_frames

    media = spark.createDataFrame(
        [("m1", b"imgbytes", 2500), ("m2", b"vid", 0)],
        "media_ref string, payload binary, duration_ms int",
    )
    r = {x.media_ref: (x.width, x.height, bytes(x.payload)) for x in
         resize_images(media, width=64, height=64, resizer=fake_resizer).collect()}
    assert r["m1"][0:2] == (64, 64) and len(r["m1"][2]) == 32
    assert r["m1"][2] != r["m2"][2]  # payload-dependent, deterministic

    def fake_frame(p, t):
        return hashlib.sha256(p + str(t).encode()).digest()[:8]

    fr = [(x.media_ref, x.ts_ms) for x in sample_frames(media, every_ms=1000, frame_fn=fake_frame).collect()]
    assert sorted(fr) == [("m1", 0), ("m1", 1000), ("m1", 2000), ("m2", 0)]

    with _pytest.raises(Exception):
        resize_images(media, width=2, height=2).collect()  # stub must raise
