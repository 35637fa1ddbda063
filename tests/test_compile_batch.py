"""Compiler.compile_batch: deferred cross-reference resolution across a
schema batch (reference: compiler.go:429-466 CompileBatch; semantics
mirrored from compiler_test.go:661 TestCompileBatchWithCrossReferences)."""

from __future__ import annotations

import pytest

from jsonschema_spark.compiler import Compiler, SchemaCompileError

SCHEMAS = {
    "person.json": {
        "$id": "person.json",
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "address": {"$ref": "address.json"},
            "employer": {"$ref": "company.json"},
        },
        "required": ["name"],
    },
    "address.json": {
        "$id": "address.json",
        "type": "object",
        "properties": {
            "street": {"type": "string"},
            "city": {"type": "string"},
            "country": {"$ref": "country.json"},
        },
        "required": ["street", "city"],
    },
    "company.json": {
        "$id": "company.json",
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "address": {"$ref": "address.json"},
        },
        "required": ["name"],
    },
    "country.json": {
        "$id": "country.json",
        "type": "object",
        "properties": {"name": {"type": "string"}, "code": {"type": "string"}},
        "required": ["name", "code"],
    },
}

VALID_PERSON = {
    "name": "John Doe",
    "address": {
        "street": "123 Main St",
        "city": "Anytown",
        "country": {"name": "United States", "code": "US"},
    },
    "employer": {
        "name": "Acme Corp",
        "address": {"street": "1 Industrial Way", "city": "Factoryville"},
    },
}


def test_batch_cross_references_resolve_in_any_order():
    compiled = Compiler().compile_batch(SCHEMAS)
    assert set(compiled) == set(SCHEMAS)
    person = compiled["person.json"]
    assert person.validate(VALID_PERSON).is_valid()
    # a nested cross-ref violation (country missing required code) surfaces
    bad = {
        "name": "Jane",
        "address": {"street": "1 Rd", "city": "X", "country": {"name": "Nowhere"}},
    }
    res = person.validate(bad)
    assert not res.is_valid()
    assert any(v.instance_path == "/address/country" for v in res.violations)


def test_batch_key_is_fallback_id():
    # no $id: the map key doubles as the retrieval URI (schema.ID = id)
    compiled = Compiler().compile_batch(
        {
            "base.json": {"type": "object", "properties": {"x": {"$ref": "leaf.json"}}},
            "leaf.json": {"type": "integer"},
        }
    )
    assert compiled["base.json"].validate({"x": 3}).is_valid()
    assert not compiled["base.json"].validate({"x": "nope"}).is_valid()


def test_batch_member_error_names_offender():
    with pytest.raises(SchemaCompileError, match="bad.json"):
        Compiler().compile_batch(
            {"bad.json": {"pattern": "("}, "ok.json": {"type": "string"}}
        )


def test_batch_validates_each_member_independently():
    compiled = Compiler().compile_batch(SCHEMAS)
    assert compiled["country.json"].validate({"name": "X", "code": "Y"}).is_valid()
    assert not compiled["country.json"].validate({"name": "X"}).is_valid()
