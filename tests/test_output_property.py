"""Property-based laws for the official "basic" output rendering: for ANY
(schema, instance) pair the scalar evaluator accepts, `to_basic()` must
itself validate against the vendored official output meta-schema, and every
violation's keywordLocation must be structurally consistent with its
keyword. Schemas are generated WITHOUT $ref — ref-crossing locations omit
absoluteKeywordLocation (documented divergence in to_basic's docstring),
which the output meta-schema's conditional would flag."""

from __future__ import annotations

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jsonschema_spark.compiler import Compiler

_SETTINGS = dict(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_OUTPUT_SCHEMA_PATH = (
    "/root/reference/testdata/JSON-Schema-Test-Suite/output-tests/"
    "draft2020-12/output-schema.json"
)


def _output_checker():
    with open(_OUTPUT_SCHEMA_PATH) as fh:
        return Compiler().compile(json.load(fh))


_CHECKER = _output_checker() if os.path.exists(_OUTPUT_SCHEMA_PATH) else None

# ---- generators ------------------------------------------------------------

_leaf_schemas = st.one_of(
    st.sampled_from(
        [
            {"type": "string"},
            {"type": "integer"},
            {"type": "number", "minimum": 0},
            {"type": "string", "minLength": 2, "maxLength": 5},
            {"type": "string", "pattern": "^[a-z]+$"},
            {"enum": ["a", "b", 3]},
            {"const": "x"},
            {"multipleOf": 2},
            {"format": "uuid"},
            True,
            False,
        ]
    )
)


def _schemas(depth: int = 2):
    if depth == 0:
        return _leaf_schemas
    sub = _schemas(depth - 1)
    return st.one_of(
        _leaf_schemas,
        st.fixed_dictionaries({}, optional={"properties": st.dictionaries(st.sampled_from(["a", "b", "~w/x"]), sub, max_size=2), "required": st.lists(st.sampled_from(["a", "b"]), max_size=2, unique=True)}),
        st.builds(lambda s: {"items": s, "minItems": 1}, sub),
        st.builds(lambda s: {"prefixItems": [s]}, sub),
        st.builds(lambda a, b: {"allOf": [a, b]}, sub, sub),
        st.builds(lambda a, b: {"anyOf": [a, b]}, sub, sub),
        st.builds(lambda s: {"not": s}, sub),
        st.builds(lambda c, t: {"if": c, "then": t}, sub, sub),
        st.builds(lambda s: {"contains": s, "minContains": 1}, sub),
    )


_instances = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-99, max_value=99),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.sampled_from(["", "a", "ab", "abc", "x", "~w/x", "0a1b2c3d-0000-4000-8000-000000000000"]),
    ),
    lambda child: st.one_of(
        st.lists(child, max_size=3),
        st.dictionaries(st.sampled_from(["a", "b", "~w/x", "other"]), child, max_size=3),
    ),
    max_leaves=8,
)

# ---- properties ------------------------------------------------------------


@given(schema=_schemas(), instance=_instances)
@settings(**_SETTINGS)
def test_to_basic_validates_against_official_output_schema(schema, instance):
    if _CHECKER is None:
        return
    result = Compiler().compile(schema).validate(instance)
    basic = result.to_basic()
    verdict = _CHECKER.validate(basic)
    assert verdict.is_valid(), (
        f"to_basic output breaks the official output schema\n"
        f"schema={schema}\ninstance={instance!r}\nbasic={basic}\n"
        f"violations={[(v.instance_path, v.keyword) for v in verdict.violations]}"
    )


@given(schema=_schemas(), instance=_instances)
@settings(**_SETTINGS)
def test_keyword_location_structure(schema, instance):
    result = Compiler().compile(schema).validate(instance)
    for v in result.violations:
        kl = v.keyword_location
        assert kl == "" or kl.startswith("/"), (v.keyword, kl)
        if v.keyword == "schema":
            # false-schema failure: the location IS the boolean schema itself
            assert not kl.endswith("/schema"), kl
        else:
            assert kl.split("/")[-1] == v.keyword, (v.keyword, kl)
        # instance paths are JSON pointers too
        ip = v.instance_path
        assert ip == "" or ip.startswith("/"), ip
