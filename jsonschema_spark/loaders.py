"""Schema-document loaders: per-scheme registry with a built-in HTTP(S)
client (reference analogue: compiler.go:336-339,397-427 — SchemeURLLoader
with a 10-second-timeout HTTP loader registered for http/https).

All loading happens ONCE, driver-side, at compile time — executors never
fetch schemas.
"""

from __future__ import annotations

import json
from typing import Any, Callable
from urllib.parse import urlparse

__all__ = ["SchemaLoadError", "HTTPLoader", "SchemeLoader", "default_loader"]

DEFAULT_TIMEOUT = 10.0  # seconds, matching the reference's http client


class SchemaLoadError(ValueError):
    pass


class HTTPLoader:
    """Fetch a schema document over http(s) with a bounded timeout.

    JSON is decoded with exact-number semantics (the same decoder the scalar
    evaluator uses) so remote schemas keep big-integer fidelity."""

    def __init__(self, timeout: float = DEFAULT_TIMEOUT) -> None:
        self.timeout = timeout

    def __call__(self, uri: str) -> Any:
        import urllib.request

        from jsonschema_spark.json_values import loads_exact

        req = urllib.request.Request(
            uri, headers={"Accept": "application/schema+json, application/json"}
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                body = resp.read()
        except Exception as exc:  # URLError, timeout, HTTPError...
            raise SchemaLoadError(f"failed to load schema from {uri!r}: {exc}") from exc
        try:
            return loads_exact(body)
        except (ValueError, json.JSONDecodeError) as exc:
            raise SchemaLoadError(f"schema at {uri!r} is not valid JSON: {exc}") from exc


class SchemeLoader:
    """Dispatch schema loading by URI scheme (reference: SchemeURLLoader).

    Resolution order: an explicitly registered scheme loader, then the
    catch-all fallback (the legacy ``Compiler(loader=...)`` callable), then
    an error naming the scheme."""

    def __init__(
        self,
        schemes: dict[str, Callable[[str], Any]] | None = None,
        fallback: Callable[[str], Any] | None = None,
    ) -> None:
        self.schemes: dict[str, Callable[[str], Any]] = dict(schemes or {})
        self.fallback = fallback

    def register(self, scheme: str, fn: Callable[[str], Any]) -> "SchemeLoader":
        self.schemes[scheme.lower()] = fn
        return self

    def __call__(self, uri: str) -> Any:
        scheme = urlparse(uri).scheme.lower()
        fn = self.schemes.get(scheme)
        if fn is not None:
            return fn(uri)
        if self.fallback is not None:
            return self.fallback(uri)
        raise SchemaLoadError(
            f"no loader registered for scheme {scheme!r} (uri {uri!r})"
        )


def default_loader(
    fallback: Callable[[str], Any] | None = None,
    timeout: float = DEFAULT_TIMEOUT,
) -> SchemeLoader:
    """http/https wired to the built-in client; ``fallback`` (if given)
    handles every scheme first — so an injected loader keeps serving e.g.
    the test suite's ``http://localhost:1234`` documents from disk."""
    http = HTTPLoader(timeout)
    loader = SchemeLoader({"http": http, "https": http})
    if fallback is not None:
        # legacy injected loaders predate the scheme registry and may serve
        # ANY uri (including http ones, from fixtures); they take precedence
        return SchemeLoader({}, fallback=_try_then(fallback, loader))
    return loader


def _try_then(primary: Callable[[str], Any], secondary: Callable[[str], Any]):
    def load(uri: str) -> Any:
        try:
            return primary(uri)
        except Exception:
            return secondary(uri)

    return load
