"""Defaults-aware projection — the reference's non-validating Unmarshal path
(reference: unmarshal.go Schema.Unmarshal, applyDefaults unmarshal.go:345-521)
re-expressed as a Spark `coalesce` projection (SURVEY §2.9).

Applies schema `default`s to NULL columns/fields; validation stays separate,
exactly like the reference, where Unmarshal "applies defaults without
validating". Static schemas only: the default tree is resolved at plan time,
so the projection is pure Column expressions."""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["apply_defaults"]


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
        try:
            dflt = F.lit(sub["default"]).cast(dt)
        except Exception:
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
