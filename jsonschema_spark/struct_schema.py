"""Schema inference from a typed Spark schema — the FromStruct analogue.

The reference generates a JSON Schema from Go struct tags
(struct_tags.go:825-843 type mapping, :846-960 tag rules); our host type
system is Spark SQL, so `schema_from_struct(StructType)` derives the schema
from column types and nullability: non-nullable => required, integral types
=> {"type": "integer"}, DecimalType bounds via precision/scale, nested
structs/arrays/maps recursively."""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

__all__ = ["schema_from_struct"]


def _field_schema(dt: T.DataType) -> dict[str, Any]:
    if isinstance(dt, T.StringType):
        return {"type": "string"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        bits = {T.ByteType: 8, T.ShortType: 16, T.IntegerType: 32, T.LongType: 64}[type(dt)]
        return {
            "type": "integer",
            "minimum": -(2 ** (bits - 1)),
            "maximum": 2 ** (bits - 1) - 1,
        }
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return {"type": "number"}
    if isinstance(dt, T.DecimalType):
        bound = 10 ** (dt.precision - dt.scale)
        return {"type": "number", "exclusiveMinimum": -bound, "exclusiveMaximum": bound}
    if isinstance(dt, (T.DateType,)):
        return {"type": "string", "format": "date"}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "string", "format": "date-time"}
    if isinstance(dt, T.BinaryType):
        return {"type": "string", "contentEncoding": "base64"}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _field_schema(dt.elementType)}
    if isinstance(dt, T.MapType):
        return {"type": "object", "additionalProperties": _field_schema(dt.valueType)}
    if isinstance(dt, T.StructType):
        return schema_from_struct(dt)
    return {}


def schema_from_struct(st: T.StructType) -> dict[str, Any]:
    """JSON Schema (draft 2020-12 shaped) describing rows of ``st``."""
    props: dict[str, Any] = {}
    required: list[str] = []
    for f in st.fields:
        props[f.name] = _field_schema(f.dataType)
        if not f.nullable:
            required.append(f.name)
    out: dict[str, Any] = {"type": "object", "properties": props}
    if required:
        out["required"] = required
    return out
