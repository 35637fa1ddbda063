"""Programmatic schema construction — the reference's constructor API
(reference: constructor.go Object/Prop/String/..., keywords.go Keyword
functions) re-expressed Pythonically: every builder returns a PLAIN DICT
(the engine's native schema form), and keyword helpers return dict
fragments merged left-to-right, so built schemas feed every compiler
(scalar, typed Column planner, Variant planner) unchanged.

    from jsonschema_spark import builder as b

    schema = b.object(
        b.prop("name", b.string(b.min_length(1), b.max_length(80))),
        b.prop("age", b.integer(b.minimum(0))),
        b.required("name"),
        b.additional_properties(False),
    )
"""

from __future__ import annotations

from typing import Any

__all__ = [
    "object_", "object", "prop", "string", "integer", "number", "boolean",
    "null", "array", "any_", "const", "enum", "one_of", "any_of", "all_of",
    "not_", "if_", "ref", "min_length", "max_length", "pattern", "format_",
    "minimum", "maximum", "exclusive_minimum", "exclusive_maximum",
    "multiple_of", "items", "prefix_items", "min_items", "max_items",
    "unique_items", "contains", "min_contains", "max_contains",
    "unevaluated_items", "required", "additional_properties",
    "pattern_properties", "property_names", "unevaluated_properties",
    "min_properties", "max_properties", "dependent_required",
    "dependent_schemas", "title", "description", "default",
    "content_encoding", "content_media_type", "content_schema", "defs",
]


class _Prop:
    __slots__ = ("name", "schema")

    def __init__(self, name: str, schema: Any):
        self.name = name
        self.schema = schema


def prop(name: str, schema: Any) -> _Prop:
    """Named property for `object` (reference: constructor.go Prop)."""
    return _Prop(name, schema)


def _merge(base: dict, *fragments: Any) -> dict:
    for frag in fragments:
        if isinstance(frag, _Prop):
            base.setdefault("properties", {})[frag.name] = frag.schema
        elif isinstance(frag, dict):
            for k, v in frag.items():
                if k == "properties" and "properties" in base:
                    base["properties"].update(v)
                else:
                    base[k] = v
        else:
            raise TypeError(f"unsupported schema fragment: {frag!r}")
    return base


def object_(*items: Any) -> dict:
    """Object schema from properties and keyword fragments
    (reference: constructor.go Object)."""
    return _merge({"type": "object"}, *items)


object = object_  # ergonomic alias (shadows the builtin only inside callers' namespaces)


def _typed(type_name: str | None, *kws: Any) -> dict:
    base: dict = {} if type_name is None else {"type": type_name}
    return _merge(base, *kws)


def string(*kws: Any) -> dict:
    return _typed("string", *kws)


def integer(*kws: Any) -> dict:
    return _typed("integer", *kws)


def number(*kws: Any) -> dict:
    return _typed("number", *kws)


def boolean(*kws: Any) -> dict:
    return _typed("boolean", *kws)


def null(*kws: Any) -> dict:
    return _typed("null", *kws)


def array(*kws: Any) -> dict:
    return _typed("array", *kws)


def any_(*kws: Any) -> dict:
    """Schema with no type restriction (reference: constructor.go Any)."""
    return _typed(None, *kws)


def const(value: Any) -> dict:
    return {"const": value}


def enum(*values: Any) -> dict:
    return {"enum": list(values)}


def one_of(*schemas: Any) -> dict:
    return {"oneOf": list(schemas)}


def any_of(*schemas: Any) -> dict:
    return {"anyOf": list(schemas)}


def all_of(*schemas: Any) -> dict:
    return {"allOf": list(schemas)}


def not_(schema: Any) -> dict:
    return {"not": schema}


def if_(condition: Any, then: Any = None, else_: Any = None) -> dict:
    """if/then/else schema (reference: constructor.go If/Then/Else chain)."""
    out: dict = {"if": condition}
    if then is not None:
        out["then"] = then
    if else_ is not None:
        out["else"] = else_
    return out


def ref(uri: str) -> dict:
    return {"$ref": uri}


def defs(**schemas: Any) -> dict:
    return {"$defs": dict(schemas)}


# ---- keyword fragments (reference: keywords.go) ---------------------------

def min_length(n: int) -> dict:
    return {"minLength": n}


def max_length(n: int) -> dict:
    return {"maxLength": n}


def pattern(rx: str) -> dict:
    return {"pattern": rx}


def format_(name: str) -> dict:
    return {"format": name}


def minimum(v: float) -> dict:
    return {"minimum": v}


def maximum(v: float) -> dict:
    return {"maximum": v}


def exclusive_minimum(v: float) -> dict:
    return {"exclusiveMinimum": v}


def exclusive_maximum(v: float) -> dict:
    return {"exclusiveMaximum": v}


def multiple_of(v: float) -> dict:
    return {"multipleOf": v}


def items(schema: Any) -> dict:
    return {"items": schema}


def prefix_items(*schemas: Any) -> dict:
    return {"prefixItems": list(schemas)}


def min_items(n: int) -> dict:
    return {"minItems": n}


def max_items(n: int) -> dict:
    return {"maxItems": n}


def unique_items(unique: bool = True) -> dict:
    return {"uniqueItems": unique}


def contains(schema: Any) -> dict:
    return {"contains": schema}


def min_contains(n: int) -> dict:
    return {"minContains": n}


def max_contains(n: int) -> dict:
    return {"maxContains": n}


def unevaluated_items(schema: Any) -> dict:
    return {"unevaluatedItems": schema}


def required(*fields: str) -> dict:
    return {"required": list(fields)}


def additional_properties(schema: Any) -> dict:
    return {"additionalProperties": schema}


def pattern_properties(patterns: dict[str, Any]) -> dict:
    return {"patternProperties": dict(patterns)}


def property_names(schema: Any) -> dict:
    return {"propertyNames": schema}


def unevaluated_properties(schema: Any) -> dict:
    return {"unevaluatedProperties": schema}


def min_properties(n: int) -> dict:
    return {"minProperties": n}


def max_properties(n: int) -> dict:
    return {"maxProperties": n}


def dependent_required(deps: dict[str, list[str]]) -> dict:
    return {"dependentRequired": {k: list(v) for k, v in deps.items()}}


def dependent_schemas(deps: dict[str, Any]) -> dict:
    return {"dependentSchemas": dict(deps)}


def title(text: str) -> dict:
    return {"title": text}


def description(text: str) -> dict:
    return {"description": text}


def default(value: Any) -> dict:
    return {"default": value}


def content_encoding(name: str) -> dict:
    return {"contentEncoding": name}


def content_media_type(name: str) -> dict:
    return {"contentMediaType": name}


def content_schema(schema: Any) -> dict:
    return {"contentSchema": schema}
