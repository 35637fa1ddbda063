"""Format validators (reference: formats.go registry + validators).

``check_format(name, value)`` returns True/False for known formats and None for
unknown formats (annotation-only per spec). Registry is extensible
(reference: compiler.go RegisterFormat). The Spark plan compiler lowers
regex-expressible formats to ``rlike``; the rest run here inside Arrow-batched
pandas UDFs.
"""

from __future__ import annotations

import ipaddress
import re
from typing import Callable

__all__ = ["check_format", "register_format", "known_formats", "SPARK_REGEX_FORMATS"]

_DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})$", re.ASCII)
_TIME_RE = re.compile(
    r"^(\d{2}):(\d{2}):(\d{2})(\.\d+)?(?:[zZ]|([+-])(\d{2}):(\d{2}))$", re.ASCII
)
_DURATION_RE = re.compile(
    r"^P(?!$)(?:\d+W|(\d+Y)?(\d+M)?(\d+D)?(T(?=\d)(\d+H)?(\d+M)?(\d+(?:\.\d+)?S)?)?)$",
    re.ASCII,
)
_UUID_RE = re.compile(r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")
_HOSTNAME_RE = re.compile(
    r"^(?=.{1,253}\.?$)[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*\.?$"
)
_EMAIL_LOCAL_RE = re.compile(r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+$")
_JSON_POINTER_RE = re.compile(r"^(?:/(?:[^~/]|~0|~1)*)*$")
_REL_JSON_POINTER_RE = re.compile(r"^(?:0|[1-9][0-9]*)(?:#|(?:/(?:[^~/]|~0|~1)*)*)$")
_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]*$")
_URI_REF_RE = re.compile(r"^[^\s\\]*$")
_URI_TEMPLATE_RE = re.compile(
    r"^(?:[^\x00-\x20\x7f\"'%<>\\^`{|}]|%[0-9A-Fa-f]{2}|\{[+#./;?&=,!@|]?(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2})"
    r"(?:\.?(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2}))*(?::[1-9][0-9]{0,3}|\*)?"
    r"(?:,(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2})(?:\.?(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2}))*(?::[1-9][0-9]{0,3}|\*)?)*\})*$"
)

_DAYS_IN_MONTH = {1: 31, 2: 29, 3: 31, 4: 30, 5: 31, 6: 30, 7: 31, 8: 31, 9: 30, 10: 31, 11: 30, 12: 31}


def _valid_date(s: str) -> bool:
    m = _DATE_RE.match(s)
    if not m:
        return False
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not (1 <= mo <= 12 and 1 <= d <= _DAYS_IN_MONTH[mo]):
        return False
    if mo == 2 and d == 29:
        return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
    return True


def _valid_time(s: str) -> bool:
    m = _TIME_RE.match(s)
    if not m:
        return False
    h, mi, sec = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if h > 23 or mi > 59 or sec > 60:
        return False
    if m.group(5):  # offset
        oh, om = int(m.group(6)), int(m.group(7))
        if oh > 23 or om > 59:
            return False
    if sec == 60:  # leap second only valid at 23:59:60 UTC-equivalent
        if m.group(5):
            sign = -1 if m.group(5) == "-" else 1
            total = (h * 60 + mi) - sign * (int(m.group(6)) * 60 + int(m.group(7)))
            total %= 24 * 60
            return total == 23 * 60 + 59
        return h == 23 and mi == 59
    return True


def _valid_datetime(s: str) -> bool:
    for sep in ("T", "t"):
        if sep in s:
            date_part, time_part = s.split(sep, 1)
            return _valid_date(date_part) and _valid_time(time_part)
    return False


def _valid_email(s: str) -> bool:
    if "@" not in s:
        return False
    local, _, domain = s.rpartition("@")
    if not local or len(local) > 64:
        return False
    if local.startswith('"') and local.endswith('"') and len(local) >= 2:
        pass  # quoted local part: accept
    else:
        if local.startswith(".") or local.endswith(".") or ".." in local:
            return False
        if not all(_EMAIL_LOCAL_RE.match(part) for part in local.split(".")):
            return False
    if domain.startswith("[") and domain.endswith("]"):
        inner = domain[1:-1]
        if inner.lower().startswith("ipv6:"):
            return _valid_ipv6(inner[5:])
        return _valid_ipv4(inner)
    return bool(_HOSTNAME_RE.match(domain)) and "." not in (domain[:1], domain[-1:])


def _valid_ipv4(s: str) -> bool:
    if not all(c in "0123456789." for c in s):
        return False
    parts = s.split(".")
    if len(parts) != 4:
        return False
    for p in parts:
        if not p.isdigit() or (len(p) > 1 and p[0] == "0") or int(p) > 255:
            return False
    return True


def _valid_ipv6(s: str) -> bool:
    if "%" in s:  # zone ids are not part of the ipv6 format
        return False
    try:
        ipaddress.IPv6Address(s)
        return True
    except ValueError:
        return False


def _valid_regex(s: str) -> bool:
    try:
        re.compile(s)
        return True
    except re.error:
        return False


def _valid_uri(s: str) -> bool:
    if not _URI_RE.match(s) or "\\" in s:
        return False
    # very light well-formedness: balanced percent-escapes, no spaces
    for i, ch in enumerate(s):
        if ch == "%" and not re.match(r"%[0-9A-Fa-f]{2}", s[i : i + 3]):
            return False
    return True


def _valid_uri_reference(s: str) -> bool:
    if not _URI_REF_RE.match(s):
        return False
    for i, ch in enumerate(s):
        if ch == "%" and not re.match(r"%[0-9A-Fa-f]{2}", s[i : i + 3]):
            return False
    return True


def _valid_duration(s: str) -> bool:
    return bool(_DURATION_RE.match(s)) and not s.endswith("T")


def _valid_period(s: str) -> bool:
    """ISO-8601 period per RFC 3339 appendix A (reference formats.go:242
    IsPeriod): "start/end" where start/end are datetime/datetime,
    datetime/duration, or duration/datetime. Split on the FIRST '/'
    (strings.Cut semantics)."""
    start, sep, end = s.partition("/")
    if not sep:
        return False
    if _valid_datetime(start):
        return _valid_datetime(end) or _valid_duration(end)
    return _valid_duration(start) and _valid_datetime(end)


_VALIDATORS: dict[str, Callable[[str], bool]] = {
    "date": _valid_date,
    "time": _valid_time,
    "date-time": _valid_datetime,
    "duration": _valid_duration,
    "period": _valid_period,
    "email": _valid_email,
    "idn-email": _valid_email,
    "hostname": lambda s: bool(_HOSTNAME_RE.match(s)),
    "ipv4": _valid_ipv4,
    "ipv6": _valid_ipv6,
    "uuid": lambda s: bool(_UUID_RE.match(s)),
    "uri": _valid_uri,
    "uri-reference": _valid_uri_reference,
    "iri": _valid_uri,
    "iri-reference": _valid_uri_reference,
    "uri-template": lambda s: bool(_URI_TEMPLATE_RE.match(s)),
    "json-pointer": lambda s: bool(_JSON_POINTER_RE.match(s)),
    "relative-json-pointer": lambda s: bool(_REL_JSON_POINTER_RE.match(s)),
    "regex": _valid_regex,
}

# Formats the Spark plan compiler can lower to a pure `rlike` Column
# (anchored Java-regex equivalents); the rest go to the pandas-UDF residue.
SPARK_REGEX_FORMATS: dict[str, str] = {
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "date": r"^\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$",
    "ipv4": r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$",
    "json-pointer": r"^(/([^~/]|~0|~1)*)*$",
}


def register_format(name: str, fn: Callable[[str], bool]) -> None:
    _VALIDATORS[name] = fn


def known_formats() -> list[str]:
    return sorted(_VALIDATORS)


def check_format(name: str, value: str) -> bool | None:
    """True/False for known formats; None (annotation-only) for unknown."""
    fn = _VALIDATORS.get(name)
    if fn is None:
        return None
    try:
        return bool(fn(value))
    except Exception:
        return False
