"""`period` format parity with the reference (formats.go:242 IsPeriod,
test vectors from utils_test.go:175-177 and validate_test.go:1527)."""

from jsonschema_spark.formats import check_format


def test_period_reference_vectors():
    assert check_format("period", "2025-01-01T00:00:00Z/P1D") is True
    assert check_format("period", "P1D/2025-01-02T00:00:00Z") is True
    assert check_format("period", "2024-01-01T00:00:00Z/P1D") is True
    assert check_format("period", "P1D") is False  # missing slash
    assert check_format("period", "P1D/P2D") is False  # duration/duration


def test_period_datetime_datetime():
    assert check_format("period", "2024-01-01T00:00:00Z/2024-06-01T00:00:00Z") is True


def test_period_rejects_garbage():
    assert check_format("period", "") is False
    assert check_format("period", "/") is False
    assert check_format("period", "2024-01-01T00:00:00Z/") is False
    assert check_format("period", "/P1D") is False
    assert check_format("period", "not-a-date/P1D") is False


def test_period_splits_on_first_slash():
    # strings.Cut semantics: everything after the FIRST '/' is the end part
    assert check_format("period", "P1D/2025-01-02T00:00:00Z/extra") is False


def test_period_asserted_by_compiler():
    """format: period must ASSERT (not annotate) under assert_format — the
    scalar/UDF path, where non-regex formats are evaluated (the pure-Column
    plan lowers only the regex-expressible formats, by design)."""
    from jsonschema_spark.compiler import Compiler

    schema = {"type": "string", "format": "period"}
    compiled = Compiler().set_assert_format(True).compile(schema)
    assert compiled.validate("2025-01-01T00:00:00Z/P1D").valid
    assert not compiled.validate("P1D").valid
    assert not compiled.validate("P1D/P2D").valid
    # non-string instances pass format (reference IsPeriod returns true for
    # non-strings) — drop the type keyword to isolate the format assertion
    untyped = Compiler().set_assert_format(True).compile({"format": "period"})
    assert untyped.validate(42).valid
