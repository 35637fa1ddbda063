"""Official suite conformance for legacy dialects: draft-04, draft-06,
draft-07 and 2019-09, through the dialect normalizer + scalar core.

Mirrors the reference's per-draft harnesses (reference: tests/draft4_test.go,
draft6_test.go, draft7_test.go, draft2019_09_test.go — full per-draft file
globs with explicit meta-validation exclusions)."""

from __future__ import annotations

import pytest

from jsonschema_spark import dialects
from jsonschema_spark.compiler import Compiler
from tests.suite_loader import draft_files, iter_tests, remote_loader, suite_available

pytestmark = pytest.mark.skipif(not suite_available(), reason="suite not vendored")

# (draft dir, dialect constant)
DRAFTS = [
    ("draft4", dialects.DRAFT_4),
    ("draft6", dialects.DRAFT_6),
    ("draft7", dialects.DRAFT_7),
    ("draft2019-09", dialects.DRAFT_2019_09),
]

# Known divergences, keyed (draft, case_desc, test_desc). The meta-validation
# negative cases are excluded exactly as the reference excludes them
# (reference: tests/test_suite_test.go schemaMetaValidationExclusions).
EXCLUSIONS: set[tuple[str, str, str]] = {
    (d, "validate definition against metaschema", "invalid definition schema")
    for d, _ in DRAFTS
}


def _run_file(draft_dir: str, dialect: str, filename: str) -> list[str]:
    failures = []
    for case_desc, test_desc, schema, data, expected in iter_tests(filename, draft_dir):
        if (draft_dir, case_desc, test_desc) in EXCLUSIONS:
            continue
        compiler = Compiler(loader=remote_loader).set_default_dialect(dialect)
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


def _params():
    out = []
    for draft_dir, dialect in DRAFTS:
        for fn in draft_files(draft_dir):
            out.append(pytest.param(draft_dir, dialect, fn, id=f"{draft_dir}-{fn}"))
    return out


@pytest.mark.parametrize("draft_dir,dialect,filename", _params())
def test_dialect_suite_file(draft_dir, dialect, filename):
    failures = _run_file(draft_dir, dialect, filename)
    assert not failures, "\n".join(failures[:25]) + f"\n({len(failures)} total)"
