"""Locale catalogs: 9 locales (reference: i18n/locales/*.json, i18n.go:29),
complete code coverage per catalog, and JVM-side localized rendering."""

from __future__ import annotations

import pytest

from jsonschema_spark.errors import EN_MESSAGES, locales, render_message
from jsonschema_spark.locales import BUILTIN_LOCALES

EXPECTED = ["de-DE", "en", "es-ES", "fr-FR", "ja-JP", "ko-KR", "pt-BR", "zh-Hans", "zh-Hant"]


def test_locale_set_matches_reference():
    assert [loc for loc in locales() if loc in EXPECTED] == EXPECTED


@pytest.mark.parametrize("loc", sorted(BUILTIN_LOCALES))
def test_catalog_covers_every_code(loc):
    missing = set(EN_MESSAGES) - set(BUILTIN_LOCALES[loc])
    assert not missing, f"{loc} missing {sorted(missing)}"
    extra = set(BUILTIN_LOCALES[loc]) - set(EN_MESSAGES)
    assert not extra, f"{loc} has unknown codes {sorted(extra)}"


@pytest.mark.parametrize("loc", sorted(BUILTIN_LOCALES))
def test_render_localized(loc):
    msg = render_message("missing_required_property", {"property": "name"}, loc)
    assert "name" in msg and msg != EN_MESSAGES["missing_required_property"]
    assert "{" not in msg  # every placeholder filled


@pytest.mark.parametrize("loc", sorted(BUILTIN_LOCALES))
def test_catalog_placeholders_match_en(loc):
    """Every locale's placeholders per code must equal the EN template's —
    a renamed placeholder (e.g. {mediaType} vs the emitter's media_type
    param) would render literally into user-facing messages."""
    import re

    ph = lambda s: set(re.findall(r"\{(\w+)\}", s))
    for code, en_tmpl in EN_MESSAGES.items():
        assert ph(BUILTIN_LOCALES[loc][code]) == ph(en_tmpl), (loc, code)


@pytest.mark.parametrize("loc", sorted(BUILTIN_LOCALES))
def test_invalid_media_type_renders_param(loc):
    # emitters pass media_type= (evaluator.py _eval_content) — the catalogs
    # must use the same placeholder name
    msg = render_message("invalid_media_type", {"media_type": "application/json"}, loc)
    assert "application/json" in msg and "{" not in msg


@pytest.mark.parametrize("loc", ["de-DE", "ja-JP", "zh-Hans"])
def test_localized_output_jvm_side(spark, loc):
    from pyspark.sql import functions as F

    from jsonschema_spark.plans.columns import validate_dataframe
    from jsonschema_spark.reporting import localized_output

    df = spark.createDataFrame([(1, "ok"), (2, "x")], "id int, name string")
    v = validate_dataframe(df, {"properties": {"name": {"minLength": 2}}})
    out = localized_output(v, ["id"], locale=loc)
    # rendering is pure Column expressions — no Python in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    msgs = {r["code"]: r["message"] for r in out.collect()}
    assert msgs["string_too_short"] == render_message("string_too_short", {"min_length": "2"}, loc)


def test_unknown_locale_raises(spark):
    from jsonschema_spark.plans.columns import validate_dataframe
    from jsonschema_spark.reporting import localized_output

    df = spark.createDataFrame([(1, "ok")], "id int, name string")
    v = validate_dataframe(df, {"properties": {"name": {"minLength": 2}}})
    with pytest.raises(ValueError):
        localized_output(v, ["id"], locale="xx-XX")
