"""Replay the official JSON-Schema-Test-Suite *output-tests* goldens
against the scalar evaluator's `to_basic()` renderer.

Each golden gives (schema, data) plus a CONSTRAINT SCHEMA the rendered
output must itself validate against; the constraint references the official
output meta-schema (`/draft/<draft>/output/schema`), served here from the
vendored copies. Reference analogue: the kaptinlin/jsonschema repo vendors
the same corpus under testdata/JSON-Schema-Test-Suite/output-tests/.

Covered drafts: 2020-12 and 2019-09 (2019-09 schemas normalize to 2020-12
at compile time — the golden-asserted keyword locations involve only
keywords the normalizer leaves in place). draft-next is not claimed.

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
DRAFTS = ["draft2020-12", "draft2019-09"]

EXCLUDED = {
    "readOnly.json": "annotation collection not implemented (violations-only engine)",
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(ROOT, DRAFTS[0])), reason="output-tests corpus not vendored"
)


def _cases():
    out = []
    for draft in DRAFTS:
        for f in sorted(glob.glob(os.path.join(ROOT, draft, "content", "*.json"))):
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
                                id=f"{draft}::{base}::{t['description']}::{fmt}",
                            )
                        )
    return out


def _output_schema_loader(uri: str):
    # e.g. https://json-schema.org/draft/2020-12/output/schema
    for draft in DRAFTS:
        tag = draft.replace("draft", "")
        if uri.rstrip("/") == f"https://json-schema.org/draft/{tag}/output/schema":
            with open(os.path.join(ROOT, draft, "output-schema.json")) as fh:
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
    for draft in DRAFTS:
        files = {
            os.path.basename(f)
            for f in glob.glob(os.path.join(ROOT, draft, "content", "*.json"))
        }
        assert set(EXCLUDED) <= files, draft
        assert files - set(EXCLUDED), f"no replayable golden files found for {draft}"
