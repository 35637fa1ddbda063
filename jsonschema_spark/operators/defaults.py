"""Defaults-aware projection — the reference's non-validating Unmarshal path
(reference: unmarshal.go Schema.Unmarshal, applyDefaults unmarshal.go:345-521)
re-expressed as a Spark `coalesce` projection (SURVEY §2.9).

Applies schema `default`s to NULL columns/fields; validation stays separate,
exactly like the reference, where Unmarshal "applies defaults without
validating". Static schemas only: the default tree is resolved at plan time,
so the projection is pure Column expressions."""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["apply_defaults", "register_default_func", "default_now_func", "DEFAULT_FUNCS"]

# ---- dynamic default functions (reference: default_funcs.go:17-78,
# unmarshal.go:595-632 — a string default in call form `name(args)` invokes a
# registered function instead of being used literally). Spark-first: the
# function returns a COLUMN, so the value is computed per row JVM-side.

DEFAULT_FUNCS: dict[str, Callable[..., Column]] = {}


def register_default_func(name: str, fn: Callable[..., Column]) -> None:
    """Register a dynamic default (reference: RegisterDefaultFunc). `fn`
    receives the parsed args (ints/floats/strings) and returns a Column."""
    DEFAULT_FUNCS[name] = fn


_GO_LAYOUT = [  # Go reference-time layout tokens → Spark datetime pattern
    ("2006", "yyyy"), ("01", "MM"), ("02", "dd"),
    ("15", "HH"), ("04", "mm"), ("05", "ss"), ("Z07:00", "XXX"),
]


def default_now_func(*args: Any) -> Column:
    """`now(layout)` analogue of the reference's DefaultNowFunc (Go layout
    string; RFC3339 when omitted). Must be registered explicitly, like the
    reference: register_default_func("now", default_now_func)."""
    layout = args[0] if args and isinstance(args[0], str) else "2006-01-02T15:04:05Z07:00"
    pattern = layout
    for go_tok, spark_tok in _GO_LAYOUT:
        pattern = pattern.replace(go_tok, spark_tok)
    return F.date_format(F.current_timestamp(), pattern)


def _parse_func_call(value: str) -> tuple[str, list[Any]] | None:
    """`name(arg, ...)` → (name, args), else None (reference:
    default_funcs.go parseFunctionCall/parseArgs)."""
    if len(value) < 3 or not value.endswith(")"):
        return None
    paren = value.find("(")
    if paren <= 0:
        return None
    name = value[:paren].strip()
    raw = value[paren + 1 : -1].strip()
    args: list[Any] = []
    if raw:
        for part in raw.split(","):
            part = part.strip()
            if not part:
                continue
            try:
                args.append(int(part))
                continue
            except ValueError:
                pass
            try:
                args.append(float(part))
                continue
            except ValueError:
                pass
            args.append(part)
    return name, args


def _default_literal(value: Any, dt: T.DataType) -> Column | None:
    if isinstance(value, str):
        call = _parse_func_call(value)
        if call is not None and call[0] in DEFAULT_FUNCS:
            try:
                return DEFAULT_FUNCS[call[0]](*call[1]).cast(dt)
            except Exception:
                return None
    try:
        return F.lit(value).cast(dt)
    except Exception:
        return None


def _default_for(sub: Any, dt: T.DataType, col: Column) -> Column | None:
    """Column with defaults applied for one field, or None if untouched."""
    if not isinstance(sub, dict):
        return None
    out = col
    touched = False
    if isinstance(dt, T.StructType) and isinstance(sub.get("properties"), dict):
        fields = []
        for f in dt.fields:
            child = _default_for(sub["properties"].get(f.name), f.dataType, col[f.name])
            fields.append((child if child is not None else col[f.name]).alias(f.name))
            touched = touched or child is not None
        if touched:
            # rebuild the struct but keep NULL structs NULL (a missing object
            # is not defaulted field-wise; matches unmarshal.go's map walk)
            out = F.when(col.isNotNull(), F.struct(*fields)).otherwise(F.lit(None).cast(dt))
    if isinstance(dt, T.ArrayType) and isinstance(sub.get("items"), dict):
        inner = sub["items"]
        probe = _default_for(inner, dt.elementType, F.lit(None).cast(dt.elementType))
        if probe is not None:
            # element-wise defaults (reference: array-item defaults,
            # unmarshal.go:635-644) via transform — no explode
            out = F.when(
                col.isNotNull(),
                F.transform(col, lambda x: _default_for(inner, dt.elementType, x)),
            ).otherwise(col)
            touched = True
    if "default" in sub:
        dflt = _default_literal(sub["default"], dt)
        if dflt is None:
            return out if touched else None
        out = F.coalesce(out, dflt)
        touched = True
    return out if touched else None


def apply_defaults(df: DataFrame, schema: dict[str, Any]) -> DataFrame:
    """df with schema `default`s applied to NULL columns/struct fields."""
    props = schema.get("properties")
    if not isinstance(props, dict):
        return df
    out = df
    for f in df.schema.fields:
        c = _default_for(props.get(f.name), f.dataType, F.col(f.name))
        if c is not None:
            out = out.withColumn(f.name, c)
    return out
