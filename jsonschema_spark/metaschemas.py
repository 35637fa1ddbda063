"""Reconstructed JSON Schema Draft 2020-12 meta-schemas.

Functionally equivalent reconstructions of the public spec meta-schema
documents (json-schema.org/draft/2020-12), written from the published spec.
Used so ``$ref``s to the meta-schema and ``$vocabulary`` dialect decisions
resolve without network access (reference analogue: embedded metaschemas
consulted by dialect.go).
"""

from __future__ import annotations

from typing import Any

DRAFT_2020_12 = "https://json-schema.org/draft/2020-12/schema"

VOCAB_CORE = "https://json-schema.org/draft/2020-12/vocab/core"
VOCAB_APPLICATOR = "https://json-schema.org/draft/2020-12/vocab/applicator"
VOCAB_UNEVALUATED = "https://json-schema.org/draft/2020-12/vocab/unevaluated"
VOCAB_VALIDATION = "https://json-schema.org/draft/2020-12/vocab/validation"
VOCAB_META_DATA = "https://json-schema.org/draft/2020-12/vocab/meta-data"
VOCAB_FORMAT_ANNOTATION = "https://json-schema.org/draft/2020-12/vocab/format-annotation"
VOCAB_FORMAT_ASSERTION = "https://json-schema.org/draft/2020-12/vocab/format-assertion"
VOCAB_CONTENT = "https://json-schema.org/draft/2020-12/vocab/content"

_BASE = "https://json-schema.org/draft/2020-12/meta/"

_ANCHOR_RE = r"^[A-Za-z_][-A-Za-z0-9._]*$"
_SIMPLE_TYPES = {"enum": ["array", "boolean", "integer", "null", "number", "object", "string"]}

_CORE: dict[str, Any] = {
    "$schema": DRAFT_2020_12,
    "$id": _BASE + "core",
    "$dynamicAnchor": "meta",
    "type": ["object", "boolean"],
    "properties": {
        "$id": {"type": "string", "format": "uri-reference", "pattern": "^[^#]*#?$"},
        "$schema": {"type": "string", "format": "uri"},
        "$ref": {"type": "string", "format": "uri-reference"},
        "$anchor": {"type": "string", "pattern": _ANCHOR_RE},
        "$dynamicRef": {"type": "string", "format": "uri-reference"},
        "$dynamicAnchor": {"type": "string", "pattern": _ANCHOR_RE},
        "$vocabulary": {
            "type": "object",
            "propertyNames": {"type": "string", "format": "uri"},
            "additionalProperties": {"type": "boolean"},
        },
        "$comment": {"type": "string"},
        "$defs": {"type": "object", "additionalProperties": {"$dynamicRef": "#meta"}},
    },
}

_APPLICATOR: dict[str, Any] = {
    "$schema": DRAFT_2020_12,
    "$id": _BASE + "applicator",
    "$dynamicAnchor": "meta",
    "type": ["object", "boolean"],
    "properties": {
        "prefixItems": {"$ref": "#/$defs/schemaArray"},
        "items": {"$dynamicRef": "#meta"},
        "contains": {"$dynamicRef": "#meta"},
        "additionalProperties": {"$dynamicRef": "#meta"},
        "properties": {
            "type": "object",
            "additionalProperties": {"$dynamicRef": "#meta"},
            "default": {},
        },
        "patternProperties": {
            "type": "object",
            "additionalProperties": {"$dynamicRef": "#meta"},
            "propertyNames": {"format": "regex"},
            "default": {},
        },
        "dependentSchemas": {
            "type": "object",
            "additionalProperties": {"$dynamicRef": "#meta"},
            "default": {},
        },
        "propertyNames": {"$dynamicRef": "#meta"},
        "if": {"$dynamicRef": "#meta"},
        "then": {"$dynamicRef": "#meta"},
        "else": {"$dynamicRef": "#meta"},
        "allOf": {"$ref": "#/$defs/schemaArray"},
        "anyOf": {"$ref": "#/$defs/schemaArray"},
        "oneOf": {"$ref": "#/$defs/schemaArray"},
        "not": {"$dynamicRef": "#meta"},
    },
    "$defs": {
        "schemaArray": {"type": "array", "minItems": 1, "items": {"$dynamicRef": "#meta"}}
    },
}

_UNEVALUATED: dict[str, Any] = {
    "$schema": DRAFT_2020_12,
    "$id": _BASE + "unevaluated",
    "$dynamicAnchor": "meta",
    "type": ["object", "boolean"],
    "properties": {
        "unevaluatedItems": {"$dynamicRef": "#meta"},
        "unevaluatedProperties": {"$dynamicRef": "#meta"},
    },
}

_VALIDATION: dict[str, Any] = {
    "$schema": DRAFT_2020_12,
    "$id": _BASE + "validation",
    "$dynamicAnchor": "meta",
    "type": ["object", "boolean"],
    "properties": {
        "type": {
            "anyOf": [
                {"$ref": "#/$defs/simpleTypes"},
                {
                    "type": "array",
                    "items": {"$ref": "#/$defs/simpleTypes"},
                    "minItems": 1,
                    "uniqueItems": True,
                },
            ]
        },
        "const": True,
        "enum": {"type": "array", "items": True},
        "multipleOf": {"type": "number", "exclusiveMinimum": 0},
        "maximum": {"type": "number"},
        "exclusiveMaximum": {"type": "number"},
        "minimum": {"type": "number"},
        "exclusiveMinimum": {"type": "number"},
        "maxLength": {"$ref": "#/$defs/nonNegativeInteger"},
        "minLength": {"$ref": "#/$defs/nonNegativeIntegerDefault0"},
        "pattern": {"type": "string", "format": "regex"},
        "maxItems": {"$ref": "#/$defs/nonNegativeInteger"},
        "minItems": {"$ref": "#/$defs/nonNegativeIntegerDefault0"},
        "uniqueItems": {"type": "boolean", "default": False},
        "maxContains": {"$ref": "#/$defs/nonNegativeInteger"},
        "minContains": {"$ref": "#/$defs/nonNegativeInteger", "default": 1},
        "maxProperties": {"$ref": "#/$defs/nonNegativeInteger"},
        "minProperties": {"$ref": "#/$defs/nonNegativeIntegerDefault0"},
        "required": {"$ref": "#/$defs/stringArray"},
        "dependentRequired": {
            "type": "object",
            "additionalProperties": {"$ref": "#/$defs/stringArray"},
        },
    },
    "$defs": {
        "nonNegativeInteger": {"type": "integer", "minimum": 0},
        "nonNegativeIntegerDefault0": {"$ref": "#/$defs/nonNegativeInteger", "default": 0},
        "simpleTypes": dict(_SIMPLE_TYPES),
        "stringArray": {
            "type": "array",
            "items": {"type": "string"},
            "uniqueItems": True,
            "default": [],
        },
    },
}

_META_DATA: dict[str, Any] = {
    "$schema": DRAFT_2020_12,
    "$id": _BASE + "meta-data",
    "$dynamicAnchor": "meta",
    "type": ["object", "boolean"],
    "properties": {
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": True,
        "deprecated": {"type": "boolean", "default": False},
        "readOnly": {"type": "boolean", "default": False},
        "writeOnly": {"type": "boolean", "default": False},
        "examples": {"type": "array", "items": True},
    },
}

_FORMAT_ANNOTATION: dict[str, Any] = {
    "$schema": DRAFT_2020_12,
    "$id": _BASE + "format-annotation",
    "$dynamicAnchor": "meta",
    "type": ["object", "boolean"],
    "properties": {"format": {"type": "string"}},
}

_CONTENT: dict[str, Any] = {
    "$schema": DRAFT_2020_12,
    "$id": _BASE + "content",
    "$dynamicAnchor": "meta",
    "type": ["object", "boolean"],
    "properties": {
        "contentEncoding": {"type": "string"},
        "contentMediaType": {"type": "string"},
        "contentSchema": {"$dynamicRef": "#meta"},
    },
}

_MAIN: dict[str, Any] = {
    "$schema": DRAFT_2020_12,
    "$id": DRAFT_2020_12,
    "$vocabulary": {
        VOCAB_CORE: True,
        VOCAB_APPLICATOR: True,
        VOCAB_UNEVALUATED: True,
        VOCAB_VALIDATION: True,
        VOCAB_META_DATA: True,
        VOCAB_FORMAT_ANNOTATION: True,
        VOCAB_CONTENT: True,
    },
    "$dynamicAnchor": "meta",
    "title": "Core and Validation specifications meta-schema (reconstruction)",
    "allOf": [
        {"$ref": "meta/core"},
        {"$ref": "meta/applicator"},
        {"$ref": "meta/unevaluated"},
        {"$ref": "meta/validation"},
        {"$ref": "meta/meta-data"},
        {"$ref": "meta/format-annotation"},
        {"$ref": "meta/content"},
    ],
    "type": ["object", "boolean"],
    "properties": {
        "definitions": {"type": "object", "additionalProperties": {"$dynamicRef": "#meta"}},
        "dependencies": {
            "type": "object",
            "additionalProperties": {
                "anyOf": [{"$dynamicRef": "#meta"}, {"$ref": "meta/validation#/$defs/stringArray"}]
            },
        },
        "$recursiveAnchor": {"type": "string", "pattern": _ANCHOR_RE},
        "$recursiveRef": {"type": "string", "format": "uri-reference"},
    },
}

ALL_DOCUMENTS: dict[str, dict[str, Any]] = {
    DRAFT_2020_12: _MAIN,
    _BASE + "core": _CORE,
    _BASE + "applicator": _APPLICATOR,
    _BASE + "unevaluated": _UNEVALUATED,
    _BASE + "validation": _VALIDATION,
    _BASE + "meta-data": _META_DATA,
    _BASE + "format-annotation": _FORMAT_ANNOTATION,
    _BASE + "content": _CONTENT,
}


VOCAB_VALIDATION_2019 = "https://json-schema.org/draft/2019-09/vocab/validation"


def register_metaschemas(registry: Any) -> None:
    for uri, doc in ALL_DOCUMENTS.items():
        if uri not in registry.resources:
            registry.register(doc, uri)
    from jsonschema_spark.metaschemas_legacy import register_legacy_metaschemas

    register_legacy_metaschemas(registry)
