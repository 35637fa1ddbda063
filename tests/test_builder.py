"""Programmatic schema builder (reference: constructor.go, keywords.go):
built dicts are plain schemas that feed every compiler unchanged."""

from __future__ import annotations

from jsonschema_spark import builder as b
from jsonschema_spark.compiler import Compiler


def test_object_with_props_and_keywords():
    schema = b.object_(
        b.prop("name", b.string(b.min_length(1), b.max_length(80))),
        b.prop("age", b.integer(b.minimum(0))),
        b.required("name"),
        b.additional_properties(False),
    )
    assert schema == {
        "type": "object",
        "properties": {
            "name": {"type": "string", "minLength": 1, "maxLength": 80},
            "age": {"type": "integer", "minimum": 0},
        },
        "required": ["name"],
        "additionalProperties": False,
    }
    c = Compiler().compile(schema)
    assert c.validate({"name": "x", "age": 3}).valid
    assert not c.validate({"age": 3}).valid
    assert not c.validate({"name": "x", "extra": 1}).valid


def test_combinators_and_conditionals():
    schema = b.any_(
        b.one_of(b.integer(), b.string(b.pattern("^a"))),
        b.if_(b.integer(), then=b.any_(b.minimum(10))),
    )
    c = Compiler().compile(schema)
    assert c.validate(12).valid
    assert not c.validate(5).valid  # integer under then-minimum
    assert c.validate("abc").valid
    assert not c.validate("zzz").valid


def test_array_and_refs():
    schema = b.any_(
        b.defs(pos=b.number(b.exclusive_minimum(0))),
        b.array(
            b.prefix_items(b.string()),
            b.items(b.ref("#/$defs/pos")),
            b.min_items(1),
            b.unique_items(),
        ),
    )
    c = Compiler().compile(schema)
    assert c.validate(["label", 1, 2.5]).valid
    assert not c.validate(["label", -1]).valid
    assert not c.validate([]).valid


def test_builder_feeds_typed_planner(spark):
    from jsonschema_spark.plans.columns import validate_dataframe

    schema = b.object_(
        b.prop("v", b.integer(b.minimum(5))),
        b.dependent_required({"v": ["tag"]}),
    )
    df = spark.createDataFrame([(1, 7, "t"), (2, 3, None)], "id int, v int, tag string")
    got = {r["id"]: r["valid"] for r in validate_dataframe(df, schema).collect()}
    assert got == {1: True, 2: False}
