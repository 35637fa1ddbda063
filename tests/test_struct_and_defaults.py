"""FromStruct analogue (schema inference from StructType) and the
defaults-aware projection (reference Unmarshal path, SURVEY §2.9)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.operators.defaults import apply_defaults
from jsonschema_spark.plans.columns import validate_dataframe
from jsonschema_spark.struct_schema import schema_from_struct


def test_schema_from_struct_roundtrips_against_plan_compiler(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    schema = schema_from_struct(df.schema)
    assert schema["properties"]["l_quantity"] == {"type": "number"}
    assert schema["properties"]["l_orderkey"]["type"] == "integer"
    # every row of the table the schema was derived from must validate
    out = validate_dataframe(df, schema)
    assert out.filter(~F.col("valid")).count() == 0


def test_schema_from_struct_nested():
    st = T.StructType(
        [
            T.StructField("id", T.StringType(), nullable=False),
            T.StructField(
                "spans",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("kind", T.StringType()),
                            T.StructField("offset", T.IntegerType()),
                        ]
                    )
                ),
            ),
            T.StructField("tags", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    s = schema_from_struct(st)
    assert s["required"] == ["id"]
    assert s["properties"]["spans"]["items"]["properties"]["offset"]["type"] == "integer"
    assert s["properties"]["tags"]["additionalProperties"]["type"] == "integer"


def test_apply_defaults_nested_struct_and_array(spark):
    df = spark.createDataFrame(
        [
            (1, None, [(None, 1), ("b", None)], ("x", None)),
            (2, "set", None, None),
        ],
        "id int, name string, items array<struct<tag:string, n:int>>, meta struct<a:string, b:string>",
    )
    schema = {
        "properties": {
            "name": {"default": "anon"},
            "items": {"items": {"properties": {"tag": {"default": "t0"}}}},
            "meta": {"properties": {"b": {"default": "bb"}}},
        }
    }
    rows = {r["id"]: r for r in apply_defaults(df, schema).collect()}
    assert rows[1]["name"] == "anon" and rows[2]["name"] == "set"
    assert [i["tag"] for i in rows[1]["items"]] == ["t0", "b"]
    # NULL array / struct stays NULL (absent objects are not defaulted field-wise)
    assert rows[2]["items"] is None and rows[2]["meta"] is None
    assert rows[1]["meta"]["b"] == "bb" and rows[1]["meta"]["a"] == "x"


def test_hierarchical_output(spark):
    """ToList(includeHierarchy=true) analogue (reference result.go:195-232):
    details nest under instance-path parents."""
    import json

    from jsonschema_spark.plans.columns import validate_dataframe
    from jsonschema_spark.reporting import hierarchical_output

    df = spark.createDataFrame(
        [(1, "ok", (5,)), (2, "x", (99,))],
        "id int, name string, meta struct<n:int>",
    )
    schema = {
        "properties": {
            "name": {"minLength": 2},
            "meta": {"properties": {"n": {"maximum": 10}}},
        }
    }
    v = validate_dataframe(df, schema)
    out = {r["id"]: (r["valid"], json.loads(r["report"])) for r in hierarchical_output(v, ["id"]).collect()}
    assert out[1][0] is True and out[1][1]["valid"] is True and out[1][1]["details"] == []
    rep = out[2][1]
    assert rep["valid"] is False
    locs = {d["instanceLocation"]: d for d in rep["details"]}
    assert "/name" in locs and "minLength" in locs["/name"]["errors"]
    assert "/meta" in locs
    nested = {d["instanceLocation"]: d for d in locs["/meta"]["details"]}
    assert "/meta/n" in nested and "maximum" in nested["/meta/n"]["errors"]


def test_dynamic_default_funcs(spark):
    """`name(args)` string defaults invoke registered functions
    (reference: default_funcs.go, unmarshal.go:595-632)."""
    from pyspark.sql import functions as SF

    from jsonschema_spark.operators.defaults import (
        DEFAULT_FUNCS,
        apply_defaults,
        default_now_func,
        register_default_func,
    )

    register_default_func("seq_from", lambda start: SF.lit(int(start) + 41))
    register_default_func("now", default_now_func)
    try:
        df = spark.createDataFrame([(1, None), (2, 7)], "id int, v int")
        out = {r["id"]: r["v"] for r in apply_defaults(df, {"properties": {"v": {"default": "seq_from(1)"}}}).collect()}
        assert out == {1: 42, 2: 7}
        # unregistered call form stays a literal string (reference behavior)
        df2 = spark.createDataFrame([(1, None)], "id int, s string")
        out2 = apply_defaults(df2, {"properties": {"s": {"default": "nope(1)"}}}).first()["s"]
        assert out2 == "nope(1)"
        # now(go-layout) renders a date via current_timestamp
        df3 = spark.createDataFrame([(1, None)], "id int, d string")
        got = apply_defaults(df3, {"properties": {"d": {"default": "now(2006-01-02)"}}}).first()["d"]
        assert len(got) == 10 and got[4] == "-" and got[7] == "-"
    finally:
        DEFAULT_FUNCS.pop("seq_from", None)
        DEFAULT_FUNCS.pop("now", None)


def test_validate_schema_metaschema():
    """Schema meta-validation API (reference: metaschema.go ValidateSchema)."""
    from jsonschema_spark.compiler import Compiler

    c = Compiler()
    assert c.validate_schema({"type": "integer"}).valid
    assert not c.validate_schema({"type": 1}).valid
    assert not c.validate_schema(
        {"$schema": "http://json-schema.org/draft-04/schema#", "minLength": -1}
    ).valid
    assert c.validate_schema(
        {"$schema": "https://json-schema.org/draft/2019-09/schema", "$defs": {"x": {"type": "integer"}}}
    ).valid


def test_reporting_outputs(spark):
    """flag / list / localized renderers (reference result.go:187-298)."""
    from jsonschema_spark.plans.columns import validate_dataframe
    from jsonschema_spark.reporting import flag_output, list_output, localized_output

    df = spark.createDataFrame([(1, "ok"), (2, "x")], "id int, name string")
    v = validate_dataframe(df, {"properties": {"name": {"minLength": 2}}})
    assert {r["id"]: r["valid"] for r in flag_output(v, ["id"]).collect()} == {1: True, 2: False}
    lst = list_output(v, ["id"]).collect()
    # leaf violation + the properties summary row (scalar-core parity)
    assert sorted((r["id"], r["code"]) for r in lst) == [
        (2, "property_mismatch"),
        (2, "string_too_short"),
    ]
    loc = localized_output(v, ["id"]).collect()
    msgs = {r["code"]: r["message"] for r in loc}
    assert msgs["string_too_short"] == "string length is under minLength 2"


def test_hierarchical_output_same_keyword_collision(spark):
    """Two violations sharing (instance path, keyword) — e.g. two failing
    allOf branches each contributing a 'minimum' at the same location — must
    BOTH survive in the report (joined), not overwrite each other."""
    import json

    from jsonschema_spark.plans.columns import validate_dataframe
    from jsonschema_spark.reporting import hierarchical_output

    df = spark.createDataFrame([(1, 0)], "id int, n int")
    schema = {
        "properties": {
            "n": {"allOf": [{"minimum": 5}, {"minimum": 7}]},
        }
    }
    v = validate_dataframe(df, schema)
    rep = json.loads(hierarchical_output(v, ["id"]).collect()[0]["report"])
    locs = {d["instanceLocation"]: d for d in rep["details"]}
    msg = locs["/n"]["errors"]["minimum"]
    # both thresholds render — one message per failing branch
    assert "5" in msg and "7" in msg
