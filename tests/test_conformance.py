"""Official draft2020-12 suite conformance for the scalar evaluator core.

Mirrors the reference's suite harness strategy (reference:
tests/test_suite_test.go — per-file runs, explicit exclusion lists for known
divergences, format files flip assert-format)."""

from __future__ import annotations

import pytest

from jsonschema_spark.compiler import Compiler
from tests.suite_loader import iter_tests, remote_loader, suite_available

pytestmark = pytest.mark.skipif(not suite_available(), reason="suite not vendored")

# Non-optional draft2020-12 files we assert 100% on.
CORE_FILES = [
    "additionalProperties.json",
    "allOf.json",
    "anchor.json",
    "anyOf.json",
    "boolean_schema.json",
    "const.json",
    "contains.json",
    "content.json",
    "default.json",
    "defs.json",
    "dependentRequired.json",
    "dependentSchemas.json",
    "dynamicRef.json",
    "enum.json",
    "exclusiveMaximum.json",
    "exclusiveMinimum.json",
    "format.json",
    "if-then-else.json",
    "infinite-loop-detection.json",
    "items.json",
    "maxContains.json",
    "maxItems.json",
    "maxLength.json",
    "maxProperties.json",
    "maximum.json",
    "minContains.json",
    "minItems.json",
    "minLength.json",
    "minProperties.json",
    "minimum.json",
    "multipleOf.json",
    "not.json",
    "oneOf.json",
    "pattern.json",
    "patternProperties.json",
    "prefixItems.json",
    "properties.json",
    "propertyNames.json",
    "ref.json",
    "refRemote.json",
    "required.json",
    "type.json",
    "unevaluatedItems.json",
    "unevaluatedProperties.json",
    "uniqueItems.json",
    "vocabulary.json",
]

# Known divergences (same mechanism as the reference's exclusion lists).
EXCLUSIONS: set[tuple[str, str]] = set()

OPTIONAL_FORMAT_FILES = [
    "optional/format/date.json",
    "optional/format/date-time.json",
    "optional/format/duration.json",
    "optional/format/ipv4.json",
    "optional/format/ipv6.json",
    "optional/format/json-pointer.json",
    "optional/format/regex.json",
    "optional/format/relative-json-pointer.json",
    "optional/format/time.json",
    "optional/format/uuid.json",
    "optional/format/hostname.json",
    "optional/format/email.json",
]


def _run_file(filename: str, assert_format: bool = False) -> list[str]:
    failures = []
    compiler = Compiler(loader=remote_loader)
    if assert_format:
        compiler.set_assert_format(True)
    for case_desc, test_desc, schema, data, expected in iter_tests(filename):
        if (case_desc, test_desc) in EXCLUSIONS:
            continue
        try:
            compiled = compiler.compile(schema, validate_regex=False)
            got = compiled.validate(data).valid
        except Exception as exc:  # compile/eval crash = failure
            failures.append(f"{filename} :: {case_desc} / {test_desc}: raised {exc!r}")
            continue
        if got != expected:
            failures.append(
                f"{filename} :: {case_desc} / {test_desc}: expected valid={expected}, got {got}"
            )
    return failures


@pytest.mark.parametrize("filename", CORE_FILES)
def test_core_suite_file(filename):
    failures = _run_file(filename)
    assert not failures, "\n".join(failures[:25]) + f"\n({len(failures)} total)"


@pytest.mark.parametrize("filename", OPTIONAL_FORMAT_FILES)
def test_optional_format_file(filename):
    failures = _run_file(filename, assert_format=True)
    assert not failures, "\n".join(failures[:25]) + f"\n({len(failures)} total)"
