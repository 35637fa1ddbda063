"""XML/YAML contentMediaType handlers (reference compiler.go:370-394
setupMediaTypes registers application/xml and application/yaml alongside
application/json) + the yaml_lite subset parser itself."""

from __future__ import annotations

from fractions import Fraction

import pytest

from jsonschema_spark import yaml_lite
from jsonschema_spark.compiler import Compiler


def _codes(result):
    return sorted(v.code for v in result.violations)


# ----------------------------------------------------------- yaml_lite unit


def test_yaml_scalars():
    assert yaml_lite.loads("42") == 42
    assert yaml_lite.loads("-7") == -7
    assert yaml_lite.loads("true") is True
    assert yaml_lite.loads("null") is None
    assert yaml_lite.loads("~") is None
    assert yaml_lite.loads("hello world") == "hello world"
    assert yaml_lite.loads("'quoted: str'") == "quoted: str"
    assert yaml_lite.loads('"esc\\nape"') == "esc\nape"
    assert yaml_lite.loads("") is None


def test_yaml_numbers_are_exact():
    v = yaml_lite.loads("0.1")
    assert v == Fraction(1, 10)  # decimal semantics, not float 0.1
    assert yaml_lite.loads("2.0") == 2
    assert yaml_lite.loads("1e3") == "1e3" or yaml_lite.loads("1.0e3") == 1000


def test_yaml_block_mapping_and_sequence():
    doc = """
# config
name: test
count: 3
items:
  - a
  - b
  - c
nested:
  inner:
    flag: true
pairs:
  - key: k1
    val: 1
  - key: k2
    val: 2
"""
    v = yaml_lite.loads(doc)
    assert v == {
        "name": "test",
        "count": 3,
        "items": ["a", "b", "c"],
        "nested": {"inner": {"flag": True}},
        "pairs": [{"key": "k1", "val": 1}, {"key": "k2", "val": 2}],
    }


def test_yaml_flow_collections():
    assert yaml_lite.loads("xs: [1, 2, three]") == {"xs": [1, 2, "three"]}
    assert yaml_lite.loads("m: {a: 1, b: [2, 3]}") == {"m": {"a": 1, "b": [2, 3]}}


def test_yaml_comments_and_doc_marker():
    assert yaml_lite.loads("---\nk: v  # trailing\n# full line\n") == {"k": "v"}
    assert yaml_lite.loads("url: http://x/#frag") == {"url": "http://x/#frag"}


def test_yaml_unsupported_constructs_raise():
    for doc in ("a: &anchor 1", "a: *alias", "a: !!int 3", "a: |\n  block",
                "k: v\n---\nk2: v2"):
        with pytest.raises(ValueError):
            yaml_lite.loads(doc)


# ------------------------------------------------- media-type assertion path


def test_yaml_media_type_asserts():
    schema = {
        "contentMediaType": "application/yaml",
        "contentSchema": {"type": "object", "required": ["name"]},
    }
    c = Compiler().set_assert_content(True).compile(schema)
    assert c.validate("name: ok\ncount: 2\n").valid
    res = c.validate("count: 2\n")
    assert not res.valid and "content_schema_mismatch" in _codes(res)
    res = c.validate("a: &x 1\n")  # unsupported construct -> parse failure
    assert not res.valid and _codes(res) == ["invalid_media_type"]


def test_xml_media_type_asserts():
    schema = {"contentMediaType": "application/xml"}
    c = Compiler().set_assert_content(True).compile(schema)
    assert c.validate("<root a='1'><child>t</child></root>").valid
    res = c.validate("<root><unclosed></root>")
    assert not res.valid and _codes(res) == ["invalid_media_type"]


def test_xml_content_schema_addresses_dict_model():
    schema = {
        "contentMediaType": "application/xml",
        "contentSchema": {
            "type": "object",
            "properties": {"tag": {"const": "doc"}},
            "required": ["tag", "children"],
        },
    }
    c = Compiler().set_assert_content(True).compile(schema)
    assert c.validate("<doc><p>hi</p></doc>").valid
    assert not c.validate("<other/>").valid


def test_base64_then_yaml_chain():
    import base64

    schema = {
        "contentEncoding": "base64",
        "contentMediaType": "application/yaml",
        "contentSchema": {"type": "object", "required": ["k"]},
    }
    c = Compiler().set_assert_content(True).compile(schema)
    payload = base64.b64encode(b"k: 1\n").decode()
    assert c.validate(payload).valid
