"""Dependency-free YAML-subset parser for contentMediaType: application/yaml.

The reference registers a full YAML unmarshaller (compiler.go:387-393,
yaml.Unmarshal); this sandbox has no YAML library, so the repo ships a
documented SUBSET parser instead of silently not asserting the media type.

Supported (covers the config-style YAML that appears as embedded content):
- block mappings (``key: value``) and block sequences (``- item``), nested by
  indentation (spaces only)
- flow collections ``[a, b]`` / ``{k: v}``, arbitrarily nested
- plain scalars: ``null``/``~``/empty → None, ``true``/``false`` (and
  Yes/No/On/Off capitalizations are NOT treated as booleans — YAML 1.2 core
  schema), integers (int), decimals/exponents (exact Fraction, matching
  json_values.loads_exact number semantics), everything else a string
- single- and double-quoted scalars (double quotes take JSON escapes)
- comments (``#`` at line start or after whitespace, never inside quotes)
- a single leading ``---`` document marker

NOT supported — raises ValueError (so contentMediaType asserts FAIL CLOSED
with code invalid_media_type rather than mis-parsing; documented divergence
from the reference for these constructs):
- anchors/aliases (&anchor, *alias), tags (!!type, !tag)
- block scalars (| and >), multi-line plain scalars
- multiple documents, complex keys (? ), merge keys (<<)
"""

from __future__ import annotations

import json
import re
from fractions import Fraction
from typing import Any

__all__ = ["loads"]

_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?$")


class YamlLiteError(ValueError):
    pass


def _strip_comment(line: str) -> str:
    """Remove a trailing comment, respecting quotes."""
    out = []
    quote: str | None = None
    i = 0
    while i < len(line):
        ch = line[i]
        if quote:
            out.append(ch)
            if ch == quote and not (quote == '"' and line[i - 1] == "\\"):
                quote = None
        elif ch in "'\"":
            quote = ch
            out.append(ch)
        elif ch == "#" and (i == 0 or line[i - 1] in " \t"):
            break
        else:
            out.append(ch)
        i += 1
    return "".join(out).rstrip()


def _parse_scalar(s: str) -> Any:
    s = s.strip()
    if s == "" or s in ("null", "~", "Null", "NULL"):
        return None
    if s in ("true", "True", "TRUE"):
        return True
    if s in ("false", "False", "FALSE"):
        return False
    for marker in ("&", "*", "!"):
        if s.startswith(marker):
            raise YamlLiteError(f"yaml-lite: anchors/aliases/tags not supported: {s[:20]!r}")
    if s.startswith(("|", ">")):
        raise YamlLiteError("yaml-lite: block scalars not supported")
    if s.startswith('"'):
        try:
            return json.loads(s)
        except json.JSONDecodeError as exc:
            raise YamlLiteError(f"bad double-quoted scalar: {s[:30]!r}") from exc
    if s.startswith("'"):
        if not s.endswith("'") or len(s) < 2:
            raise YamlLiteError(f"bad single-quoted scalar: {s[:30]!r}")
        return s[1:-1].replace("''", "'")
    if s.startswith(("[", "{")):
        return _parse_flow(s)
    if _INT_RE.match(s):
        return int(s)
    if _FLOAT_RE.match(s) and ("." in s or "e" in s or "E" in s):
        # exact decimal semantics, same model as json_values.loads_exact
        f = Fraction(s)
        return int(f) if f.denominator == 1 else f
    return s


def _parse_flow(s: str) -> Any:
    val, rest = _flow_value(s.strip())
    if rest.strip():
        raise YamlLiteError(f"trailing content after flow collection: {rest[:20]!r}")
    return val


def _flow_value(s: str) -> tuple[Any, str]:
    s = s.lstrip()
    if s.startswith("["):
        out: list[Any] = []
        s = s[1:].lstrip()
        if s.startswith("]"):
            return out, s[1:]
        while True:
            v, s = _flow_value(s)
            out.append(v)
            s = s.lstrip()
            if s.startswith(","):
                s = s[1:]
                continue
            if s.startswith("]"):
                return out, s[1:]
            raise YamlLiteError(f"bad flow sequence near {s[:20]!r}")
    if s.startswith("{"):
        obj: dict[str, Any] = {}
        s = s[1:].lstrip()
        if s.startswith("}"):
            return obj, s[1:]
        while True:
            k, s = _flow_value(s)
            if not isinstance(k, str):
                k = _plain_repr(k)
            s = s.lstrip()
            if not s.startswith(":"):
                raise YamlLiteError(f"expected ':' in flow mapping near {s[:20]!r}")
            v, s = _flow_value(s[1:])
            obj[k] = v
            s = s.lstrip()
            if s.startswith(","):
                s = s[1:]
                continue
            if s.startswith("}"):
                return obj, s[1:]
            raise YamlLiteError(f"bad flow mapping near {s[:20]!r}")
    if s.startswith(('"', "'")):
        quote = s[0]
        i = 1
        while i < len(s):
            if s[i] == "\\" and quote == '"':
                i += 2
                continue
            if s[i] == quote:
                return _parse_scalar(s[: i + 1]), s[i + 1 :]
            i += 1
        raise YamlLiteError(f"unterminated quoted scalar: {s[:30]!r}")
    # plain scalar: up to the next structural character
    m = re.match(r"[^,\[\]{}:]*", s)
    tok = m.group(0)
    return _parse_scalar(tok), s[len(tok) :]


def _plain_repr(v: Any) -> str:
    return "null" if v is None else str(v)


def _split_key(line: str) -> tuple[str, str] | None:
    """'key: rest' respecting quotes; None when the line is not a mapping entry."""
    quote: str | None = None
    for i, ch in enumerate(line):
        if quote:
            if ch == quote and not (quote == '"' and line[i - 1] == "\\"):
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == ":" and (i + 1 == len(line) or line[i + 1] in " \t"):
            return line[:i].strip(), line[i + 1 :].strip()
    return None


class _Parser:
    def __init__(self, lines: list[tuple[int, str]]):
        self.lines = lines  # (indent, content)
        self.i = 0

    def _peek(self) -> tuple[int, str] | None:
        return self.lines[self.i] if self.i < len(self.lines) else None

    def parse_block(self, indent: int) -> Any:
        first = self._peek()
        assert first is not None
        if first[1].startswith("- ") or first[1] == "-":
            return self._parse_seq(first[0])
        return self._parse_map(first[0])

    def _parse_seq(self, indent: int) -> list[Any]:
        out: list[Any] = []
        while True:
            cur = self._peek()
            if cur is None or cur[0] != indent or not (cur[1].startswith("- ") or cur[1] == "-"):
                if cur is not None and cur[0] > indent:
                    raise YamlLiteError(f"bad indentation under sequence at {cur[1][:20]!r}")
                return out
            rest = cur[1][2:].strip() if cur[1] != "-" else ""
            self.i += 1
            if not rest:
                nxt = self._peek()
                if nxt is not None and nxt[0] > indent:
                    out.append(self.parse_block(nxt[0]))
                else:
                    out.append(None)
            elif _split_key(rest) is not None:
                # inline mapping start: '- key: value' — re-inject as a
                # virtual line at the item's column and parse the mapping
                self.lines.insert(self.i, (indent + 2, rest))
                out.append(self._parse_map(indent + 2))
            else:
                out.append(_parse_scalar(rest))

    def _parse_map(self, indent: int) -> dict[str, Any]:
        out: dict[str, Any] = {}
        while True:
            cur = self._peek()
            if cur is None or cur[0] != indent:
                if cur is not None and cur[0] > indent:
                    raise YamlLiteError(f"bad indentation at {cur[1][:20]!r}")
                return out
            kv = _split_key(cur[1])
            if kv is None:
                raise YamlLiteError(f"expected 'key: value' at {cur[1][:30]!r}")
            key, rest = kv
            if key.startswith(("?", "<<")):
                raise YamlLiteError(f"yaml-lite: unsupported key form {key[:10]!r}")
            key = _parse_scalar(key)
            if not isinstance(key, str):
                key = _plain_repr(key)
            self.i += 1
            if rest:
                out[key] = _parse_scalar(rest)
            else:
                nxt = self._peek()
                if nxt is not None and nxt[0] > indent:
                    out[key] = self.parse_block(nxt[0])
                else:
                    out[key] = None


def loads(data: str | bytes) -> Any:
    """Parse one YAML-subset document; ValueError on unsupported constructs."""
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    raw_lines = data.splitlines()
    if raw_lines and raw_lines[0].strip() == "---":
        raw_lines = raw_lines[1:]
    lines: list[tuple[int, str]] = []
    for raw in raw_lines:
        if "\t" in raw[: len(raw) - len(raw.lstrip())]:
            raise YamlLiteError("yaml-lite: tabs in indentation not supported")
        stripped = _strip_comment(raw)
        if not stripped.strip():
            continue
        if stripped.strip() in ("---", "..."):
            raise YamlLiteError("yaml-lite: multi-document streams not supported")
        indent = len(stripped) - len(stripped.lstrip(" "))
        lines.append((indent, stripped.strip()))
    if not lines:
        return None
    if len(lines) == 1 and _split_key(lines[0][1]) is None and not lines[0][1].startswith("- "):
        return _parse_scalar(lines[0][1])
    return _Parser(lines).parse_block(lines[0][0])
