"""Dialect support: draft-04 / draft-06 / draft-07 / 2019-09 → 2020-12.

Clean-room analogue of the reference's dialect machinery (reference:
dialect.go — `$schema`-driven keyword claiming, legacy keyword binding,
Draft-04 boolean exclusive bounds, `$recursiveRef`/`$recursiveAnchor`
mapping). Where the reference claims keywords into a typed struct at decode
time, we NORMALIZE the schema document into an equivalent 2020-12 document on
the driver, once, before registration — the scalar core, the typed Column
planner and the Variant planner then all speak exactly one dialect.

Transformations (all driver-side, pure dict → dict):
- ``items`` as an array → ``prefixItems``; ``additionalItems`` → ``items``
  (reference: dialect.go usesLegacyTupleItems, schema.go items decode).
- ``dependencies`` → ``dependentRequired`` / ``dependentSchemas`` split
  (reference: dialect.go applyLegacyDependencies).
- Draft-04 boolean ``exclusiveMinimum``/``exclusiveMaximum`` + bound →
  numeric exclusive bound (reference: dialect.go applyLegacyExclusiveBounds).
- Draft-04 ``id`` → ``$id``; fragment-only (or fragment-carrying) ids in
  drafts 4-7 → ``$anchor`` (reference: dialect.go supportsLegacyIDAnchors).
- 2019-09 ``$recursiveAnchor: true`` → ``$dynamicAnchor`` with a reserved
  name; ``$recursiveRef: "#"`` → ``$dynamicRef`` to that name when the
  enclosing resource declares the anchor, else a plain ``$ref`` (reference:
  dialect.go claimLegacyKeywords, recursiveDynamicAnchor).
- Drafts 4-7: ``$ref`` ignores sibling keywords (reference: dialect.go
  refIgnoresSiblings) — siblings are dropped from evaluation; ``definitions``
  is preserved so JSON-pointer targets keep resolving.
- Keywords a dialect does not recognize but 2020-12 evaluates (e.g.
  ``const`` in draft-04, ``if`` in draft-06, ``unevaluatedProperties`` in
  draft-07) are removed so they stay inert, matching each draft's semantics.
- Draft-04 ``type: "integer"`` is lexically strict (``1.0`` is NOT an
  integer): marked with an internal ``x-d4-strict-integer`` flag the scalar
  evaluator honors (instances parsed by ``loads_exact`` keep the int/float
  distinction).
"""

from __future__ import annotations

from typing import Any

__all__ = [
    "DRAFT_2020_12",
    "DRAFT_2019_09",
    "DRAFT_7",
    "DRAFT_6",
    "DRAFT_4",
    "RECURSIVE_ANCHOR",
    "STRICT_INTEGER_KEY",
    "detect_dialect",
    "normalize_schema",
]

DRAFT_2020_12 = "2020-12"
DRAFT_2019_09 = "2019-09"
DRAFT_7 = "draft-07"
DRAFT_6 = "draft-06"
DRAFT_4 = "draft-04"

# reserved $dynamicAnchor name standing in for $recursiveAnchor:true
RECURSIVE_ANCHOR = "__recursive_anchor__"
# internal marker: draft-04 lexically-strict integer type
STRICT_INTEGER_KEY = "x-d4-strict-integer"

_URI_DIALECTS = {
    "https://json-schema.org/draft/2020-12/schema": DRAFT_2020_12,
    "http://json-schema.org/draft/2020-12/schema": DRAFT_2020_12,
    "https://json-schema.org/draft/2019-09/schema": DRAFT_2019_09,
    "http://json-schema.org/draft/2019-09/schema": DRAFT_2019_09,
    "https://json-schema.org/draft-07/schema": DRAFT_7,
    "http://json-schema.org/draft-07/schema": DRAFT_7,
    "https://json-schema.org/draft-06/schema": DRAFT_6,
    "http://json-schema.org/draft-06/schema": DRAFT_6,
    "https://json-schema.org/draft-04/schema": DRAFT_4,
    "http://json-schema.org/draft-04/schema": DRAFT_4,
}


def dialect_from_uri(uri: str, fallback: str | None = None) -> str | None:
    return _URI_DIALECTS.get(uri.strip().rstrip("#"), fallback)


def detect_dialect(schema: Any, default: str = DRAFT_2020_12) -> str:
    """Dialect of a schema document from its `$schema`, else the default."""
    if isinstance(schema, dict):
        meta = schema.get("$schema")
        if isinstance(meta, str):
            return dialect_from_uri(meta, default) or default
    return default


# ---------------------------------------------------------------------------
# keyword claim sets: which 2020-12-EVALUATED keywords each dialect recognizes
# (keywords outside this set that 2020-12 would evaluate must be dropped so
# they stay annotations under the legacy dialect)
# ---------------------------------------------------------------------------

_COMMON = frozenset(
    """$ref $schema type enum minimum maximum multipleOf minLength maxLength
    pattern items additionalItems maxItems minItems uniqueItems maxProperties
    minProperties required properties patternProperties additionalProperties
    dependencies allOf anyOf oneOf not format definitions exclusiveMinimum
    exclusiveMaximum""".split()
)

_CLAIMED: dict[str, frozenset[str]] = {}
_CLAIMED[DRAFT_4] = _COMMON | {"id"}
_CLAIMED[DRAFT_6] = _COMMON | {"$id", "const", "contains", "propertyNames"}
_CLAIMED[DRAFT_7] = _CLAIMED[DRAFT_6] | {
    "if",
    "then",
    "else",
    "contentMediaType",
    "contentEncoding",
}
_CLAIMED[DRAFT_2019_09] = (_CLAIMED[DRAFT_7] | {
    "$defs",
    "$anchor",
    "$recursiveRef",
    "$recursiveAnchor",
    "$vocabulary",
    "dependentRequired",
    "dependentSchemas",
    "unevaluatedItems",
    "unevaluatedProperties",
    "minContains",
    "maxContains",
    "contentSchema",
}) - {"id"}

# every keyword the 2020-12 engine acts on (evaluation or identification);
# normalization drops these when the source dialect does not claim them
_EVALUATED_2020 = frozenset(
    """$ref $id $anchor $dynamicRef $dynamicAnchor $vocabulary $defs type enum
    const minimum maximum exclusiveMinimum exclusiveMaximum multipleOf
    minLength maxLength pattern format items prefixItems contains minContains
    maxContains maxItems minItems uniqueItems unevaluatedItems maxProperties
    minProperties required properties patternProperties additionalProperties
    propertyNames dependentRequired dependentSchemas unevaluatedProperties
    allOf anyOf oneOf not if then else contentMediaType contentEncoding
    contentSchema""".split()
)

# subschema container shapes (2020-12 names, used for recursion)
_SINGLE = frozenset(
    """additionalProperties contains propertyNames if then else not items
    unevaluatedItems unevaluatedProperties contentSchema""".split()
)
_MAP = frozenset("$defs definitions properties patternProperties dependentSchemas".split())
_LIST = frozenset("allOf anyOf oneOf prefixItems".split())


def normalize_schema(schema: Any, default_dialect: str = DRAFT_2020_12) -> Any:
    """Normalize a schema document of any supported dialect into 2020-12.

    2020-12 documents are returned unchanged (identity — no copy)."""
    dialect = detect_dialect(schema, default_dialect)
    if dialect == DRAFT_2020_12 and default_dialect == DRAFT_2020_12:
        # still walk for EMBEDDED legacy resources (nested legacy $schema
        # under a 2020-12 root) — identity is preserved when none exist
        return _walk_modern(schema)
    return _norm(schema, dialect, _rec_anchor(schema, dialect))


def _rec_anchor(node: Any, dialect: str) -> bool:
    """Does this (2019-09) resource root declare $recursiveAnchor: true?"""
    return (
        dialect == DRAFT_2019_09
        and isinstance(node, dict)
        and node.get("$recursiveAnchor") is True
    )


def _is_resource_root(node: dict, dialect: str) -> bool:
    key = "id" if dialect == DRAFT_4 else "$id"
    sid = node.get(key)
    return isinstance(sid, str) and sid.split("#", 1)[0] != ""


def _walk_modern(node: Any) -> Any:
    """Walk a 2020-12 subtree looking for embedded legacy-dialect resource
    roots (a nested legacy ``$schema``) and normalize exactly those subtrees
    into 2020-12, mirroring the reference's per-resource dialect switching
    (dialect.go). Returns the ORIGINAL object identity when nothing changes,
    so the all-modern fast path stays copy-free."""
    if isinstance(node, bool) or not isinstance(node, dict):
        return node
    here = detect_dialect(node, DRAFT_2020_12)
    if here != DRAFT_2020_12:
        return _norm(node, here, _rec_anchor(node, here))
    out: dict | None = None
    for key, v in node.items():
        new_v = v
        if key in _SINGLE:
            new_v = _walk_modern(v)
        elif key in _MAP and isinstance(v, dict):
            walked = {k: _walk_modern(sub) for k, sub in v.items()}
            if any(walked[k] is not v[k] for k in v):
                new_v = walked
        elif key in _LIST and isinstance(v, list):
            walked_l = [_walk_modern(sub) for sub in v]
            if any(a is not b for a, b in zip(walked_l, v)):
                new_v = walked_l
        if new_v is not v:
            if out is None:
                out = dict(node)
            out[key] = new_v
    return out if out is not None else node


def _norm(node: Any, dialect: str, rec: bool) -> Any:
    if isinstance(node, bool) or not isinstance(node, dict):
        return node

    # a nested $schema switches dialect for the subtree (resource roots)
    here = detect_dialect(node, dialect)
    if here != dialect:
        dialect = here
        rec = _rec_anchor(node, dialect)
    if dialect == DRAFT_2020_12:
        # the subtree ITSELF is modern, but it may embed a legacy resource
        # deeper down (nested legacy $schema) — keep walking, identity-safe
        return _walk_modern(node)
    if _is_resource_root(node, dialect):
        rec = _rec_anchor(node, dialect)

    claimed = _CLAIMED[dialect]
    legacy_ref_only = dialect in (DRAFT_4, DRAFT_6, DRAFT_7)

    # drafts 4-7: $ref ignores every sibling keyword; keep `definitions`
    # (and $defs if present) purely as pointer-target containers
    if legacy_ref_only and isinstance(node.get("$ref"), str):
        out: dict[str, Any] = {"$ref": node["$ref"]}
        for container in ("definitions", "$defs"):
            if isinstance(node.get(container), dict):
                out[container] = {
                    k: _norm(v, dialect, rec) for k, v in node[container].items()
                }
        return out

    out = {}
    for key, v in node.items():
        if key == "items":
            if isinstance(v, list):
                out["prefixItems"] = [_norm(b, dialect, rec) for b in v]
                ai = node.get("additionalItems")
                if isinstance(ai, (dict, bool)):
                    out["items"] = _norm(ai, dialect, rec)
                else:
                    # keep the ORIGINAL list under "items" as an inert
                    # pointer-target alias (suite refs like "#/items/0");
                    # every evaluator ignores a list-valued items, and the
                    # subschema dicts are shared with prefixItems so
                    # identifier registration sees one copy
                    out["items"] = out["prefixItems"]
            else:
                out["items"] = _norm(v, dialect, rec)
            continue
        if key == "additionalItems":
            continue  # bound together with items above (or ignored)
        if key == "dependencies" and isinstance(v, dict):
            dep_req: dict[str, list] = {}
            dep_sch: dict[str, Any] = {}
            for prop, dep in v.items():
                if isinstance(dep, list):
                    dep_req[prop] = dep
                elif isinstance(dep, (dict, bool)):
                    dep_sch[prop] = _norm(dep, dialect, rec)
            if dep_req:
                out["dependentRequired"] = dep_req
            if dep_sch:
                out["dependentSchemas"] = dep_sch
            continue
        if key in ("id", "$id") and isinstance(v, str) and key in claimed:
            base, _, frag = v.partition("#")
            if base:
                out["$id"] = base
            if frag:
                # legacy id anchors ("#foo" or "base#foo") → $anchor
                out["$anchor"] = frag
            continue
        if dialect == DRAFT_2019_09 and key == "$recursiveAnchor":
            if v is True:
                out["$dynamicAnchor"] = RECURSIVE_ANCHOR
            continue
        if dialect == DRAFT_2019_09 and key == "$recursiveRef" and isinstance(v, str):
            # "#" resolves dynamically only when the enclosing resource
            # declares the anchor; otherwise it is a plain resource-root ref
            if v == "#" and rec:
                out["$dynamicRef"] = "#" + RECURSIVE_ANCHOR
            else:
                out.setdefault("$ref", v)
            continue
        if key in ("exclusiveMinimum", "exclusiveMaximum") and isinstance(v, bool):
            if dialect != DRAFT_4:
                continue  # boolean exclusives only exist in draft-4
            bound_kw = "minimum" if key == "exclusiveMinimum" else "maximum"
            if v is True and bound_kw in node:
                out[key] = node[bound_kw]
                out.pop(bound_kw, None)
                out["__drop_" + bound_kw] = True  # resolved after the loop
            continue
        if key in _EVALUATED_2020 and key not in claimed:
            continue  # 2020-12 would evaluate it; this dialect must not
        if key in _SINGLE:
            out[key] = _norm(v, dialect, rec)
        elif key in _MAP and isinstance(v, dict):
            out[key] = {k: _norm(sub, dialect, rec) for k, sub in v.items()}
        elif key in _LIST and isinstance(v, list):
            out[key] = [_norm(sub, dialect, rec) for sub in v]
        else:
            out[key] = v

    for bound_kw in ("minimum", "maximum"):
        if out.pop("__drop_" + bound_kw, None):
            out.pop(bound_kw, None)

    if dialect == DRAFT_4 and "type" in out:
        t = out["type"]
        if t == "integer" or (isinstance(t, list) and "integer" in t):
            out[STRICT_INTEGER_KEY] = True

    return out
