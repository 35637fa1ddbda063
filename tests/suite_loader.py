"""Loader for the official JSON-Schema-Test-Suite (vendored in the reference
repo as public test data). Suite semantics: each file is a list of
{description, schema, tests:[{description, data, valid}]}.

Remote-ref cases reference http://localhost:1234/... which the upstream
harness serves from the suite's remotes/ directory; we resolve those to files
directly (no network)."""

from __future__ import annotations

import os
from typing import Any

from jsonschema_spark.json_values import loads_exact

SUITE_ROOT = "/root/reference/testdata/JSON-Schema-Test-Suite"
DRAFT_DIR = os.path.join(SUITE_ROOT, "tests", "draft2020-12")
REMOTES_DIR = os.path.join(SUITE_ROOT, "remotes")

LOCALHOST_PREFIX = "http://localhost:1234/"


def suite_available() -> bool:
    return os.path.isdir(DRAFT_DIR)


def core_files() -> list[str]:
    return sorted(f for f in os.listdir(DRAFT_DIR) if f.endswith(".json"))


# files whose cases never fetch localhost remotes (safe without a loader,
# e.g. inside executor-side UDFs)
CORE_NO_REMOTE_FILES = [
    f
    for f in (
        "additionalProperties.json allOf.json anchor.json anyOf.json boolean_schema.json "
        "const.json contains.json content.json default.json defs.json dependentRequired.json "
        "dependentSchemas.json enum.json exclusiveMaximum.json exclusiveMinimum.json format.json "
        "if-then-else.json infinite-loop-detection.json items.json maxContains.json maxItems.json "
        "maxLength.json maxProperties.json maximum.json minContains.json minItems.json "
        "minLength.json minProperties.json minimum.json multipleOf.json not.json oneOf.json "
        "pattern.json patternProperties.json prefixItems.json properties.json propertyNames.json "
        "required.json type.json unevaluatedItems.json unevaluatedProperties.json uniqueItems.json"
    ).split()
]


def remote_loader(uri: str) -> Any:
    if uri.startswith(LOCALHOST_PREFIX):
        rel = uri[len(LOCALHOST_PREFIX) :]
        path = os.path.join(REMOTES_DIR, rel)
        with open(path, "rb") as f:
            return loads_exact(f.read())
    raise KeyError(f"no loader for {uri}")


def load_cases(filename: str, draft: str = "draft2020-12") -> list[dict[str, Any]]:
    path = os.path.join(SUITE_ROOT, "tests", draft, filename)
    with open(path, "rb") as f:
        return loads_exact(f.read())


def draft_files(draft: str) -> list[str]:
    d = os.path.join(SUITE_ROOT, "tests", draft)
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.endswith(".json"))


def iter_tests(filename: str, draft: str = "draft2020-12"):
    """Yield (case_desc, test_desc, schema, data, valid) tuples."""
    for case in load_cases(filename, draft):
        for test in case["tests"]:
            yield case["description"], test["description"], case["schema"], test["data"], test["valid"]
