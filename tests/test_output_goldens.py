"""Replay the official JSON-Schema-Test-Suite *output-tests* goldens
against the scalar evaluator's `to_basic()` renderer.

Each golden gives (schema, data) plus a CONSTRAINT SCHEMA the rendered
output must itself validate against; the constraint references the official
output meta-schema (`/draft/2020-12/output/schema`), served here from the
vendored copy. Reference analogue: the kaptinlin/jsonschema repo vendors
the same corpus under testdata/JSON-Schema-Test-Suite/output-tests/.

Documented divergences (same exclusion policy as test_conformance.py):
- readOnly.json requires ANNOTATION collection (readOnly surfacing as an
  annotation unit); this is a violations-only engine — the reference's
  result.go likewise centers its wire contract on errors — so annotation
  units are not produced and the case is excluded.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from jsonschema_spark.compiler import Compiler

ROOT = "/root/reference/testdata/JSON-Schema-Test-Suite/output-tests"
DRAFT_DIR = os.path.join(ROOT, "draft2020-12")
OUTPUT_SCHEMA_URI = "https://json-schema.org/draft/2020-12/output/schema"

EXCLUDED = {
    "readOnly.json": "annotation collection not implemented (violations-only engine)",
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DRAFT_DIR), reason="output-tests corpus not vendored"
)


def _cases():
    out = []
    for f in sorted(glob.glob(os.path.join(DRAFT_DIR, "content", "*.json"))):
        base = os.path.basename(f)
        if base in EXCLUDED:
            continue
        with open(f) as fh:
            doc = json.load(fh)
        for case in doc:
            for t in case["tests"]:
                for fmt, constraint in t["output"].items():
                    out.append(
                        pytest.param(
                            case["schema"],
                            t["data"],
                            fmt,
                            constraint,
                            id=f"{base}::{t['description']}::{fmt}",
                        )
                    )
    return out


def _output_schema_loader(uri: str):
    if uri.rstrip("/") == OUTPUT_SCHEMA_URI:
        with open(os.path.join(DRAFT_DIR, "output-schema.json")) as fh:
            return json.load(fh)
    raise KeyError(f"unexpected remote ref in golden constraint: {uri}")


@pytest.mark.parametrize("schema,data,fmt,constraint", _cases())
def test_output_golden(schema, data, fmt, constraint):
    assert fmt == "basic", f"golden uses unimplemented format {fmt!r}"
    rendered = Compiler().compile(schema).validate(data).to_basic()
    checker = Compiler(loader=_output_schema_loader).compile(constraint)
    verdict = checker.validate(rendered)
    assert verdict.is_valid(), (
        f"rendered basic output violates the golden constraint:\n"
        f"output={json.dumps(rendered, indent=1)}\n"
        f"violations={[ (v.instance_path, v.keyword, v.code) for v in verdict.violations ]}"
    )


def test_excluded_files_still_exist():
    """If the corpus gains or loses files, surface it instead of silently
    shrinking coverage."""
    files = {os.path.basename(f) for f in glob.glob(os.path.join(DRAFT_DIR, "content", "*.json"))}
    assert set(EXCLUDED) <= files
    assert files - set(EXCLUDED), "no replayable golden files found"
