"""Stable error codes + message catalog.

The *codes* and their param keys are the compatibility contract with the
reference validator (reference: i18n/locales/en.json — 62 codes; result.go
EvaluationError{Keyword, Code, Message, Params}). Message strings here are our
own phrasing; consumers match on ``code``, never on the rendered message.

Localization: register additional locale catalogs with :func:`register_locale`;
rendering falls back to English for missing codes (reference: result.go:43-50).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

__all__ = ["EN_MESSAGES", "render_message", "register_locale", "locales"]

# Every code the engine can emit. Param placeholders use {name} syntax.
EN_MESSAGES: dict[str, str] = {
    "additional_property_mismatch": "additional property {property} fails its schema",
    "additional_properties_mismatch": "additional properties {properties} fail their schema",
    "all_of_item_mismatch": "value fails allOf branch(es) at index {indexs}",
    "any_of_item_mismatch": "value fails every anyOf branch",
    "if_then_mismatch": "value satisfies 'if' but fails the 'then' schema",
    "if_else_mismatch": "value fails 'if' and also fails the 'else' schema",
    "const_mismatch_null": "value must equal the constant null",
    "const_mismatch": "value must equal the declared constant",
    "contains_too_few_items": "array needs at least {min_contains} matching item(s)",
    "contains_too_many_items": "array allows at most {max_contains} matching item(s)",
    "unsupported_encoding": "contentEncoding '{encoding}' is not supported",
    "invalid_encoding": "payload failed to decode as '{encoding}'",
    "unsupported_media_type": "contentMediaType '{media_type}' is not supported",
    "invalid_media_type": "payload failed to parse as media type '{media_type}'",
    "content_schema_mismatch": "decoded content fails contentSchema",
    "dependent_property_required": "dependent required properties missing: {missing_properties}",
    "dependent_schema_mismatch": "presence of {property} triggers a dependent schema the value fails",
    "dependent_schemas_mismatch": "presence of {properties} triggers dependent schemas the value fails",
    "value_not_in_enum": "got {received}; allowed values: {expected}",
    "exclusive_maximum_mismatch": "{value} must be strictly below {exclusive_maximum}",
    "exclusive_minimum_mismatch": "{value} must be strictly above {exclusive_minimum}",
    "unsupported_format": "format {format} is not supported",
    "format_mismatch": "value is not a valid {format}",
    "item_mismatch": "array element {index} fails the items schema",
    "items_mismatch": "array elements {indexs} fail the items schema",
    "value_above_maximum": "{value} exceeds maximum {maximum}",
    "value_below_minimum": "{value} is under minimum {minimum}",
    "items_too_long": "array length exceeds maxItems {max_items}",
    "items_too_short": "array length is under minItems {min_items}",
    "string_too_long": "string length exceeds maxLength {max_length}",
    "string_too_short": "string length is under minLength {min_length}",
    "too_many_properties": "object has more than maxProperties {max_properties} members",
    "too_few_properties": "object has fewer than minProperties {min_properties} members",
    "not_multiple_of": "value is not an exact multiple of {multiple_of}",
    "invalid_multiple_of": "multipleOf divisor {multiple_of} must be > 0",
    "not_schema_mismatch": "value must NOT match the 'not' schema, but does",
    "one_of_multiple_matches": "value matches more than one oneOf branch (indexes {matches})",
    "one_of_item_mismatch": "value matches no oneOf branch",
    "invalid_pattern": "regex pattern {pattern} is invalid",
    "pattern_mismatch": "string does not match pattern {pattern}",
    "pattern_property_mismatch": "property {property} fails its patternProperties schema",
    "pattern_properties_mismatch": "properties {properties} fail their patternProperties schemas",
    "prefix_item_mismatch": "element {index} fails its prefixItems schema",
    "prefix_items_mismatch": "elements {indexs} fail their prefixItems schemas",
    "property_mismatch": "property {property} fails its schema",
    "properties_mismatch": "properties {properties} fail their schemas",
    "property_name_mismatch": "property name {property} fails the propertyNames schema",
    "property_names_mismatch": "property names {properties} fail the propertyNames schema",
    "missing_required_property": "required property {property} is absent",
    "missing_required_properties": "required properties {properties} are absent",
    "type_mismatch": "type is {received}; expected {expected}",
    "unevaluated_item_mismatch": "unevaluated element {index} fails unevaluatedItems",
    "unevaluated_items_mismatch": "unevaluated elements {indexs} fail unevaluatedItems",
    "unevaluated_property_mismatch": "unevaluated property {property} fails unevaluatedProperties",
    "unevaluated_properties_mismatch": "unevaluated properties {properties} fail unevaluatedProperties",
    "item_serialization_error": "element {index} could not be serialized",
    "unique_items_mismatch": "duplicate elements at index groups {duplicates}",
    "invalid_numeric": "got {received}; a numeric value is required",
    "ref_mismatch": "value fails the referenced ($ref) schema",
    "dynamic_ref_mismatch": "value fails the dynamic reference schema",
    "false_schema_mismatch": "schema is 'false': no value is valid",
}

_LOCALES: dict[str, dict[str, str]] = {"en": EN_MESSAGES}

# built-in catalogs: same locale set as the reference (i18n/i18n.go:29)
from jsonschema_spark.locales import BUILTIN_LOCALES as _BUILTIN  # noqa: E402

_LOCALES.update(_BUILTIN)


def catalog_for(locale: str) -> dict[str, str]:
    """The catalog for a locale (English when unknown) — used by JVM-side
    rendering to build the message-map literal."""
    return _LOCALES.get(locale, EN_MESSAGES)

_PLACEHOLDER = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")


def register_locale(name: str, catalog: Mapping[str, str]) -> None:
    """Register (or extend) a locale message catalog."""
    _LOCALES.setdefault(name, {}).update(catalog)


def locales() -> list[str]:
    return sorted(_LOCALES)


def render_message(code: str, params: Mapping[str, Any] | None = None, locale: str = "en") -> str:
    """Render a code to a human message; falls back to English, then the code."""
    catalog = _LOCALES.get(locale, EN_MESSAGES)
    template = catalog.get(code) or EN_MESSAGES.get(code) or code
    params = params or {}

    def _sub(m: re.Match[str]) -> str:
        key = m.group(1)
        return str(params.get(key, m.group(0)))

    return _PLACEHOLDER.sub(_sub, template)
