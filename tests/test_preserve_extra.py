"""SetPreserveExtra analogue (reference: schema.go Extra,
compiler.go:307-316 SetPreserveExtra): unknown keywords surfaced per
subschema pointer for tooling; validation ignores them either way."""

from jsonschema_spark.compiler import Compiler

SCHEMA = {
    "type": "object",
    "x-internal": {"owner": "data-eng"},
    "title": "doc",  # annotation keyword — known, NOT extra
    "properties": {
        "a": {"type": "string", "x-pii": True},
        "b": {"items": {"x-note": "n", "type": "integer"}},
    },
    "allOf": [{"x-rule": 1}],
}


def test_extra_disabled_by_default():
    c = Compiler().compile(SCHEMA)
    assert c.extra == {}
    assert c.validate({"a": "s"}).valid  # unknown keywords never assert


def test_extra_collected_per_pointer():
    c = Compiler().set_preserve_extra(True).compile(SCHEMA)
    assert c.extra == {
        "": {"x-internal": {"owner": "data-eng"}},
        "/properties/a": {"x-pii": True},
        "/properties/b/items": {"x-note": "n"},
        "/allOf/0": {"x-rule": 1},
    }
    # schema itself is never stripped (dict model, unlike the Go struct)
    assert "x-internal" in c.schema


def test_annotation_keywords_are_not_extra():
    c = Compiler().set_preserve_extra(True).compile(
        {"title": "t", "description": "d", "default": 1, "$comment": "c"}
    )
    assert c.extra == {}
