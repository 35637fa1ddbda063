"""Public compile entry point (reference analogue: compiler.go Compiler).

Compilation happens ONCE, on the Spark driver: parse → register identifiers →
dialect/vocabulary analysis → static regex validation → ready-to-run
:class:`Evaluator` (scalar / UDF path) or Spark Column plan (typed path, see
``jsonschema_spark.plans``). Compiled schemas are cached by URI.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from jsonschema_spark import dialects, metaschemas
from jsonschema_spark.evaluator import EvaluationResult, Evaluator
from jsonschema_spark.json_values import loads_exact, to_exact
from jsonschema_spark.registry import Registry

__all__ = ["Compiler", "CompiledSchema", "compile_schema", "SchemaCompileError"]


class SchemaCompileError(ValueError):
    pass


_SCHEMA_KEYWORDS_WITH_PATTERNS = ("pattern",)


def _walk_patterns(schema: Any, path: str, problems: list[str]) -> None:
    """Static regex syntax validation over the whole schema tree
    (reference analogue: schema.go validateRegexSyntax)."""
    if isinstance(schema, dict):
        for kw in _SCHEMA_KEYWORDS_WITH_PATTERNS:
            pat = schema.get(kw)
            if isinstance(pat, str):
                try:
                    re.compile(pat)
                except re.error as exc:
                    problems.append(f"{path}/{kw}: invalid pattern {pat!r}: {exc}")
        pp = schema.get("patternProperties")
        if isinstance(pp, dict):
            for pat in pp:
                try:
                    re.compile(pat)
                except re.error as exc:
                    problems.append(f"{path}/patternProperties: invalid pattern {pat!r}: {exc}")
        for k, v in schema.items():
            _walk_patterns(v, f"{path}/{k}", problems)
    elif isinstance(schema, list):
        for i, v in enumerate(schema):
            _walk_patterns(v, f"{path}/{i}", problems)


# keywords the engine recognizes but never evaluates (typed annotation
# fields in the reference's Schema struct — NOT Extra; schema.go)
_ANNOTATION_KEYWORDS = frozenset(
    """title description default examples deprecated readOnly writeOnly
    $comment $schema""".split()
)


def collect_extra(schema: Any, pointer: str = "") -> dict[str, dict[str, Any]]:
    """JSON-pointer → {keyword: value} of UNKNOWN keywords per subschema
    (reference: schema.go Extra + compiler.go SetPreserveExtra — the
    reference binds schemas to a typed struct and parks unbound members in
    Extra; here schemas stay dicts, so "preserving" means surfacing them
    for tooling: extension vocabularies, x- keywords, OpenAPI extras)."""
    if not isinstance(schema, dict):
        return {}
    known = dialects._EVALUATED_2020 | _ANNOTATION_KEYWORDS | {"definitions"}
    out: dict[str, dict[str, Any]] = {}
    extra = {k: v for k, v in schema.items() if k not in known}
    if extra:
        out[pointer or ""] = extra
    for kw, sub in schema.items():
        esc = kw.replace("~", "~0").replace("/", "~1")
        if kw in dialects._SINGLE:
            out.update(collect_extra(sub, f"{pointer}/{esc}"))
        elif kw in dialects._MAP and isinstance(sub, dict):
            for name, s in sub.items():
                n = name.replace("~", "~0").replace("/", "~1")
                out.update(collect_extra(s, f"{pointer}/{esc}/{n}"))
        elif kw in dialects._LIST and isinstance(sub, list):
            for i, s in enumerate(sub):
                out.update(collect_extra(s, f"{pointer}/{esc}/{i}"))
    return out


class CompiledSchema:
    def __init__(self, evaluator: Evaluator, uri: str, extra: dict | None = None):
        self._evaluator = evaluator
        self.uri = uri
        #: unknown-keyword map (pointer -> {keyword: value}); populated only
        #: under Compiler.set_preserve_extra(True), else {}
        self.extra: dict[str, dict[str, Any]] = extra or {}

    @property
    def schema(self) -> Any:
        return self._evaluator.schema

    def validate(self, instance: Any) -> EvaluationResult:
        """Validate a pre-parsed Python value (normalized to exact numbers)."""
        return self._evaluator.validate(to_exact(instance))

    def validate_json(self, text: str | bytes) -> EvaluationResult:
        """Validate raw JSON text with exact-number decoding."""
        return self._evaluator.validate(loads_exact(text))

    def is_valid(self, instance: Any) -> bool:
        return self.validate(instance).valid


class Compiler:
    """Driver-side schema compiler with a URI cache and pluggable loaders."""

    def __init__(self, loader: Callable[[str], Any] | None = None) -> None:
        from jsonschema_spark.evaluator import default_decoders, default_media_types
        from jsonschema_spark.loaders import default_loader

        # per-scheme dispatch with a built-in 10s-timeout HTTP(S) client
        # (reference: compiler.go:336-339,397-427); an injected ``loader``
        # keeps full precedence for every scheme (legacy contract)
        self._loader = default_loader(fallback=loader)
        self._assert_format = False
        self._assert_content = False
        self._preserve_extra = False
        self._decoders = default_decoders()
        self._media_types = default_media_types()
        self._default_dialect = dialects.DRAFT_2020_12
        self._cache: dict[int, CompiledSchema] = {}

    def set_assert_format(self, enabled: bool) -> "Compiler":
        self._assert_format = enabled
        return self

    def set_assert_content(self, enabled: bool) -> "Compiler":
        """Evaluate contentEncoding/contentMediaType/contentSchema as
        assertions (reference: content.go; 2020-12 default is annotation)."""
        self._assert_content = enabled
        return self

    def set_preserve_extra(self, enabled: bool) -> "Compiler":
        """Surface unknown keywords on CompiledSchema.extra (reference:
        compiler.go SetPreserveExtra). Off by default, matching strict spec
        behavior — unknown keywords are ignored for validation either way
        (schemas here stay plain dicts, so nothing is ever stripped from
        `.schema`; this only controls whether `.extra` is populated)."""
        self._preserve_extra = enabled
        return self

    def register_decoder(self, encoding: str, fn: Callable[[str], bytes]) -> "Compiler":
        """Custom contentEncoding decoder (reference: compiler.go
        RegisterDecoder)."""
        self._decoders[encoding] = fn
        return self

    def register_media_type(self, media_type: str, fn: Callable[[bytes], Any]) -> "Compiler":
        """Custom contentMediaType unmarshaller (reference: compiler.go
        RegisterMediaType)."""
        self._media_types[media_type] = fn
        return self

    def register_loader(self, scheme: str, fn: Callable[[str], Any]) -> "Compiler":
        """Register a loader for one URI scheme (reference: compiler.go
        SchemeURLLoader registration). Explicit schemes win over the
        constructor's catch-all loader and over the built-in HTTP client."""
        self._loader.register(scheme, fn)
        return self

    def set_default_dialect(self, dialect: str) -> "Compiler":
        """Dialect assumed when a schema has no `$schema` (reference:
        dialect.go SetDefaultDialect). Accepts a dialect constant from
        `jsonschema_spark.dialects` or a metaschema URI."""
        d = dialects.dialect_from_uri(dialect) if dialect.startswith("http") else dialect
        if d not in (
            dialects.DRAFT_2020_12,
            dialects.DRAFT_2019_09,
            dialects.DRAFT_7,
            dialects.DRAFT_6,
            dialects.DRAFT_4,
        ):
            raise SchemaCompileError(f"unsupported dialect: {dialect!r}")
        self._default_dialect = d
        return self

    def _wrapped_loader(self) -> Callable[[str], Any] | None:
        if self._loader is None:
            return None
        loader, default = self._loader, self._default_dialect

        def load(uri: str) -> Any:
            # remote documents are normalized under THEIR $schema, falling
            # back to the compiler's default dialect (reference: dialect
            # inheritance in applyDialects)
            return dialects.normalize_schema(loader(uri), default)

        return load

    def compile(self, schema: Any, uri: str = "", *, validate_regex: bool = True) -> CompiledSchema:
        """Compile a schema given as dict/bool, or as JSON text/bytes."""
        if isinstance(schema, (str, bytes)):
            schema = loads_exact(schema)
        if not isinstance(schema, (dict, bool)):
            raise SchemaCompileError(f"schema must be an object or boolean, got {type(schema)}")

        if validate_regex:
            problems: list[str] = []
            _walk_patterns(schema, "", problems)
            if problems:
                raise SchemaCompileError("; ".join(problems))

        schema = dialects.normalize_schema(schema, self._default_dialect)

        registry = Registry(loader=self._wrapped_loader())
        metaschemas.register_metaschemas(registry)
        root_uri = registry.register(schema, uri)

        assert_format, no_validation = self._dialect_flags(schema, registry)
        evaluator = Evaluator(
            schema,
            registry,
            assert_format=assert_format or self._assert_format,
            no_validation=no_validation,
            assert_content=self._assert_content,
            decoders=self._decoders,
            media_types=self._media_types,
        )
        extra = collect_extra(schema) if self._preserve_extra else None
        return CompiledSchema(evaluator, root_uri, extra)

    def compile_batch(
        self, schemas: dict[str, Any], *, validate_regex: bool = True
    ) -> dict[str, CompiledSchema]:
        """Compile many schemas with deferred cross-reference resolution
        (reference: compiler.go:429-466 CompileBatch, compiler_test.go:661).

        Every document is registered into ONE shared registry BEFORE any
        evaluator is built, so batch members may forward-reference each
        other in any order ("person.json" can `$ref` "address.json" that
        appears later in the map). A schema without `$id` is registered
        under its map key, mirroring the reference's `schema.ID = id`
        fallback; `$ref` targets then resolve lazily at validate time
        through the shared registry."""
        parsed: dict[str, Any] = {}
        for sid, schema in schemas.items():
            if isinstance(schema, (str, bytes)):
                schema = loads_exact(schema)
            if not isinstance(schema, (dict, bool)):
                raise SchemaCompileError(
                    f"batch schema {sid!r} must be an object or boolean, got {type(schema)}"
                )
            if validate_regex:
                problems: list[str] = []
                _walk_patterns(schema, "", problems)
                if problems:
                    raise SchemaCompileError(f"{sid}: " + "; ".join(problems))
            parsed[sid] = dialects.normalize_schema(schema, self._default_dialect)

        registry = Registry(loader=self._wrapped_loader())
        metaschemas.register_metaschemas(registry)
        root_uris = {sid: registry.register(s, sid) for sid, s in parsed.items()}

        out: dict[str, CompiledSchema] = {}
        for sid, schema in parsed.items():
            assert_format, no_validation = self._dialect_flags(schema, registry)
            evaluator = Evaluator(
                schema,
                registry,
                assert_format=assert_format or self._assert_format,
                no_validation=no_validation,
                assert_content=self._assert_content,
                decoders=self._decoders,
                media_types=self._media_types,
            )
            extra = collect_extra(schema) if self._preserve_extra else None
            out[sid] = CompiledSchema(evaluator, root_uris[sid], extra)
        return out

    def validate_schema(self, schema: Any) -> EvaluationResult:
        """Validate a schema DOCUMENT against its metaschema (reference:
        metaschema.go ValidateSchema). The metaschema is chosen from the
        document's `$schema`, falling back to the compiler's default dialect;
        all five supported drafts' metaschemas are embedded."""
        from jsonschema_spark.metaschemas_legacy import (
            DRAFT_2019_URI,
            DRAFT_4_URI,
            DRAFT_6_URI,
            DRAFT_7_URI,
        )

        if isinstance(schema, (str, bytes)):
            schema = loads_exact(schema)
        dialect_meta = {
            dialects.DRAFT_2020_12: metaschemas.DRAFT_2020_12,
            dialects.DRAFT_2019_09: DRAFT_2019_URI,
            dialects.DRAFT_7: DRAFT_7_URI,
            dialects.DRAFT_6: DRAFT_6_URI,
            dialects.DRAFT_4: DRAFT_4_URI,
        }
        meta_uri = dialect_meta[self._default_dialect]
        if isinstance(schema, dict) and isinstance(schema.get("$schema"), str):
            meta_uri = schema["$schema"].split("#", 1)[0]

        registry = Registry(loader=self._wrapped_loader())
        metaschemas.register_metaschemas(registry)
        if meta_uri in registry.resources:
            meta = registry.resources[meta_uri]
        else:
            loader = self._wrapped_loader()
            if loader is None:
                raise SchemaCompileError(f"unknown metaschema: {meta_uri!r} (no loader)")
            meta = loader(meta_uri)
            registry.register(meta, meta_uri)
        evaluator = Evaluator(meta, registry)
        return evaluator.validate(to_exact(schema))

    def _dialect_flags(self, schema: Any, registry: Registry) -> tuple[bool, bool]:
        """Vocabulary-driven behavior from the declared $schema
        (reference analogue: dialect.go metaschema vocabulary analysis)."""
        assert_format = False
        no_validation = False
        if not isinstance(schema, dict):
            return assert_format, no_validation
        meta_uri = schema.get("$schema")
        if not isinstance(meta_uri, str) or meta_uri == metaschemas.DRAFT_2020_12:
            return assert_format, no_validation
        meta_uri = meta_uri.split("#", 1)[0]
        try:
            meta = registry.resources.get(meta_uri)
            if meta is None and self._loader is not None:
                meta = self._loader(meta_uri)
                registry.register(meta, meta_uri)
        except Exception:
            return assert_format, no_validation
        if isinstance(meta, dict):
            vocab = meta.get("$vocabulary")
            if isinstance(vocab, dict):
                if (
                    metaschemas.VOCAB_VALIDATION not in vocab
                    and metaschemas.VOCAB_VALIDATION_2019 not in vocab
                ):
                    no_validation = True
                if vocab.get(metaschemas.VOCAB_FORMAT_ASSERTION) is not None:
                    assert_format = True
        return assert_format, no_validation


def compile_schema(schema: Any, **kwargs: Any) -> CompiledSchema:
    return Compiler(loader=kwargs.pop("loader", None)).compile(schema, **kwargs)
