"""Content vocabulary assertions (reference: content.go evaluateContent).

2020-12 treats contentEncoding/contentMediaType/contentSchema as annotations;
under assert_content they decode-and-validate, mirroring the reference's
behavior (which excludes the affected official-suite cases)."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.compiler import Compiler

SCHEMA = {
    "contentEncoding": "base64",
    "contentMediaType": "application/json",
    "contentSchema": {"type": "object", "required": ["k"]},
}


def _codes(result):
    return sorted(v.code for v in result.violations)


def test_annotation_only_by_default():
    c = Compiler().compile(SCHEMA)
    assert c.validate("definitely-not-base64!%").valid


def test_valid_chain():
    c = Compiler().set_assert_content(True).compile(SCHEMA)
    payload = base64.b64encode(json.dumps({"k": 1}).encode()).decode()
    assert c.validate(payload).valid


def test_invalid_base64():
    c = Compiler().set_assert_content(True).compile(SCHEMA)
    res = c.validate("not%valid%base64")
    assert not res.valid and _codes(res) == ["invalid_encoding"]


def test_invalid_json_after_decode():
    c = Compiler().set_assert_content(True).compile(SCHEMA)
    payload = base64.b64encode(b"{not json").decode()
    res = c.validate(payload)
    assert not res.valid and _codes(res) == ["invalid_media_type"]


def test_content_schema_mismatch_with_sub_violations():
    c = Compiler().set_assert_content(True).compile(SCHEMA)
    payload = base64.b64encode(json.dumps({"other": 1}).encode()).decode()
    res = c.validate(payload)
    codes = _codes(res)
    assert "content_schema_mismatch" in codes
    assert "missing_required_property" in codes


def test_unsupported_encoding_and_media_type():
    c = Compiler().set_assert_content(True).compile({"contentEncoding": "rot13"})
    assert _codes(c.validate("x")) == ["unsupported_encoding"]
    c2 = Compiler().set_assert_content(True).compile({"contentMediaType": "image/png"})
    assert _codes(c2.validate("x")) == ["unsupported_media_type"]


def test_custom_decoder_registration():
    c = (
        Compiler()
        .set_assert_content(True)
        .register_decoder("hex", bytes.fromhex)
        .compile({"contentEncoding": "hex", "contentMediaType": "application/json"})
    )
    assert c.validate(json.dumps({"a": 1}).encode().hex()).valid
    assert not c.validate("zz").valid


def test_non_string_instances_skip_content():
    c = Compiler().set_assert_content(True).compile(SCHEMA)
    assert c.validate(42).valid
    assert c.validate({"k": 1}).valid


def test_typed_planner_matches_scalar(spark):
    from jsonschema_spark.plans.columns import SparkPlanCompiler

    payloads = [
        base64.b64encode(json.dumps({"k": 1}).encode()).decode(),  # valid
        base64.b64encode(json.dumps({"other": 2}).encode()).decode(),  # schema fail
        base64.b64encode(b"{nope").decode(),  # json fail
        "!!!not-base64!!!",  # decode fail
        None,  # absent
    ]
    obj_schema = {"properties": {"payload": SCHEMA}}
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)], "id int, payload string")
    plan = SparkPlanCompiler(obj_schema, assert_content=True)
    got = {r["id"]: r["valid"] for r in plan.apply(df).collect()}
    scalar = Compiler().set_assert_content(True).compile(obj_schema)
    for i, p in enumerate(payloads):
        inst = {"payload": p} if p is not None else {}
        assert got[i] == scalar.validate(inst).valid, (i, p)


def test_reference_suite_divergence_set():
    """Under assert_content, exactly the reference's excluded official-suite
    cases flip to invalid (reference: test_suite_test.go
    contentValidationExclusions)."""
    from tests.suite_loader import iter_tests, suite_available

    if not suite_available():
        pytest.skip("suite not vendored")
    flipped = []
    for case_desc, test_desc, schema, data, expected in iter_tests("content.json"):
        c = Compiler().set_assert_content(True).compile(schema)
        got = c.validate(data).valid
        if got != expected:
            flipped.append(f"{case_desc}/{test_desc}")
    # every divergence is an expected=valid case the assertions now reject
    assert flipped, "assert_content should reject the annotation-only cases"
    for f in flipped:
        assert "validates true" in f or "base64" in f or "empty" in f, f
