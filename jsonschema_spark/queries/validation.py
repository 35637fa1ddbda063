"""Validation-engine contract queries (plan compiler / UDF / variant paths; SURVEY §2.2-§2.6)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsonschema_spark.plans import SparkPlanCompiler

from jsonschema_spark.queries.base import (
    _t,
    _violations,
)

# --------------------------------------------------------------------------
# Validation engine queries (plan compiler — leaf assertions, SURVEY §2.2)
# --------------------------------------------------------------------------

DOCS_TABLE_SCHEMA = {
    "type": "object",
    "required": ["doc_id", "text", "lang", "source", "n_chars"],
    "properties": {
        "doc_id": {"type": "integer", "minimum": 0},
        "lang": {"enum": ["en", "de", "fr", "es"]},
        "n_chars": {"type": "integer", "minimum": 60, "maximum": 500},
        "text": {"type": "string", "minLength": 60, "pattern": "^[a-z ]+$"},
        "source": {"type": "string", "pattern": "^src[0-9]+$"},
    },
}


def validate_documents_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _violations(_t(spark, sf_dir, "documents"), DOCS_TABLE_SCHEMA, ["doc_id"])


ORACLE_DOCS_VIOLATIONS = """
SELECT doc_id, '/lang' AS instance_path, 'enum' AS keyword, 'value_not_in_enum' AS code
FROM documents WHERE lang NOT IN ('en','de','fr','es')
UNION ALL
SELECT doc_id, '/n_chars', 'minimum', 'value_below_minimum' FROM documents WHERE n_chars < 60
UNION ALL
SELECT doc_id, '/n_chars', 'maximum', 'value_above_maximum' FROM documents WHERE n_chars > 500
UNION ALL
SELECT doc_id, '/text', 'minLength', 'string_too_short' FROM documents WHERE length(text) < 60
UNION ALL
SELECT doc_id, '/text', 'pattern', 'pattern_mismatch' FROM documents WHERE NOT regexp_matches(text, '^[a-z ]+$')
UNION ALL
SELECT doc_id, '/source', 'pattern', 'pattern_mismatch' FROM documents WHERE NOT regexp_matches(source, '^src[0-9]+$')
UNION ALL
-- properties applicator summary row (scalar-core parity: one row per doc,
-- singular code when exactly one property fails, plural when several)
SELECT doc_id, '', 'properties',
       CASE WHEN nbad = 1 THEN 'property_mismatch' ELSE 'properties_mismatch' END
FROM (
  SELECT doc_id,
         (CASE WHEN doc_id < 0 THEN 1 ELSE 0 END)
       + (CASE WHEN lang NOT IN ('en','de','fr','es') THEN 1 ELSE 0 END)
       + (CASE WHEN n_chars < 60 OR n_chars > 500 THEN 1 ELSE 0 END)
       + (CASE WHEN length(text) < 60 OR NOT regexp_matches(text, '^[a-z ]+$') THEN 1 ELSE 0 END)
       + (CASE WHEN NOT regexp_matches(source, '^src[0-9]+$') THEN 1 ELSE 0 END) AS nbad
  FROM documents)
WHERE nbad >= 1
"""


def validate_documents_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = SparkPlanCompiler(DOCS_TABLE_SCHEMA, assert_format=True).apply(_t(spark, sf_dir, "documents"))
    return out.select("doc_id", "valid")


ORACLE_DOCS_FLAG = """
SELECT doc_id,
       (lang IN ('en','de','fr','es') AND n_chars BETWEEN 60 AND 500
        AND length(text) >= 60 AND regexp_matches(text, '^[a-z ]+$')
        AND regexp_matches(source, '^src[0-9]+$')) AS valid
FROM documents
"""


SPANS_SCHEMA = {
    "type": "object",
    "required": ["doc_id", "spans"],
    "properties": {
        "spans": {
            "type": "array",
            "minItems": 1,
            "items": {
                "type": "object",
                "required": ["kind", "offset"],
                "properties": {
                    "kind": {"enum": ["text", "media"]},
                    "offset": {"type": "integer", "minimum": 0, "maximum": 400},
                },
            },
        }
    },
}


def _events_as_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-docs shape derived deterministically from events:
    one doc per user, spans ordered by (ts, event_id)."""
    e = _t(spark, sf_dir, "events")
    agg = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type", "value", "props"))
        ).alias("evs")
    )
    spans = F.transform(
        F.col("evs"),
        lambda x: F.struct(
            F.when(x["event_type"].isin("click", "view"), F.lit("text"))
            .otherwise(F.lit("media"))
            .alias("kind"),
            F.when(x["event_type"].isin("click", "view"), x["props"]).alias("text"),
            F.when(
                ~x["event_type"].isin("click", "view"),
                F.concat(F.lit("media://"), x["event_id"].cast("string")),
            ).alias("media_ref"),
            F.floor(x["value"]).cast("int").alias("offset"),
        ),
    )
    return agg.select(F.col("user_id").alias("doc_id"), spans.alias("spans"))


def validate_spans_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-span checks via higher-order functions (items/transform path)."""
    return _violations(_events_as_spans(spark, sf_dir), SPANS_SCHEMA, ["doc_id"])


ORACLE_SPANS_OFFSETS = """
WITH spans AS (
  SELECT user_id AS doc_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS pos,
         CAST(FLOOR(value) AS INT) AS off
  FROM events),
bad AS (SELECT doc_id, pos FROM spans WHERE off > 400)
SELECT doc_id, '/spans/' || pos || '/offset' AS instance_path,
       'maximum' AS keyword, 'value_above_maximum' AS code
FROM bad
UNION ALL
SELECT doc_id, '/spans/' || pos, 'properties', 'property_mismatch' FROM bad
UNION ALL
SELECT doc_id, '/spans', 'items',
       CASE WHEN count(*) = 1 THEN 'item_mismatch' ELSE 'items_mismatch' END
FROM bad GROUP BY doc_id
UNION ALL
SELECT DISTINCT doc_id, '', 'properties', 'property_mismatch' FROM bad
"""


PROPS_SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 10, "maximum": 90}},
}


def validate_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-JSON residue path: Arrow-batched evaluator UDF on a raw JSON col."""
    from jsonschema_spark.functions.udf import validate_json_column

    e = _t(spark, sf_dir, "events", hot=True).select("event_id", "props")
    return validate_json_column(e, "props", PROPS_SCHEMA).select("event_id", "valid")


ORACLE_PROPS_JSON = """
SELECT event_id,
       (CAST(json_extract(props, '$.k') AS INTEGER) BETWEEN 10 AND 90) AS valid
FROM events
"""


def kw_logical_oneof(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = {
        "oneOf": [
            {"properties": {"n_chars": {"maximum": 150}}},
            {"properties": {"lang": {"const": "en"}}},
        ]
    }
    out = SparkPlanCompiler(schema).apply(_t(spark, sf_dir, "documents"))
    return out.select("doc_id", "valid")


ORACLE_ONEOF = """
SELECT doc_id,
       ((CASE WHEN n_chars <= 150 THEN 1 ELSE 0 END)
        + (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)) = 1 AS valid
FROM documents
"""


def kw_logical_anyof_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = {
        "allOf": [
            {
                "anyOf": [
                    {"properties": {"lang": {"enum": ["en", "de"]}}},
                    {"properties": {"n_chars": {"minimum": 200}}},
                ]
            },
            {"not": {"properties": {"source": {"const": "src0"}}}},
        ]
    }
    out = SparkPlanCompiler(schema).apply(_t(spark, sf_dir, "documents"))
    return out.select("doc_id", "valid")


ORACLE_ANYOF_NOT = """
SELECT doc_id,
       ((lang IN ('en','de') OR n_chars >= 200) AND NOT (source = 'src0')) AS valid
FROM documents
"""


def kw_numeric_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = {
        "properties": {
            "l_quantity": {"multipleOf": 5, "exclusiveMinimum": 0},
            "l_extendedprice": {"maximum": 50000},
            "l_discount": {"exclusiveMaximum": 0.1},
            "l_tax": {"minimum": 0.01},
        }
    }
    return _violations(
        _t(spark, sf_dir, "lineitem", hot=True), schema, ["l_orderkey", "l_linenumber"]
    )


ORACLE_NUMERIC_LINEITEM = """
SELECT l_orderkey, l_linenumber, '/l_quantity' AS instance_path, 'multipleOf' AS keyword, 'not_multiple_of' AS code
FROM lineitem WHERE CAST(l_quantity AS DECIMAL(38,12)) % 5 != 0
UNION ALL
SELECT l_orderkey, l_linenumber, '/l_extendedprice', 'maximum', 'value_above_maximum'
FROM lineitem WHERE l_extendedprice > 50000
UNION ALL
SELECT l_orderkey, l_linenumber, '/l_discount', 'exclusiveMaximum', 'exclusive_maximum_mismatch'
FROM lineitem WHERE l_discount >= 0.1
UNION ALL
SELECT l_orderkey, l_linenumber, '/l_tax', 'minimum', 'value_below_minimum'
FROM lineitem WHERE l_tax < 0.01
UNION ALL
SELECT l_orderkey, l_linenumber, '', 'properties',
       CASE WHEN nbad = 1 THEN 'property_mismatch' ELSE 'properties_mismatch' END
FROM (
  SELECT l_orderkey, l_linenumber,
         (CASE WHEN CAST(l_quantity AS DECIMAL(38,12)) % 5 != 0 OR l_quantity <= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN l_extendedprice > 50000 THEN 1 ELSE 0 END)
       + (CASE WHEN l_discount >= 0.1 THEN 1 ELSE 0 END)
       + (CASE WHEN l_tax < 0.01 THEN 1 ELSE 0 END) AS nbad
  FROM lineitem)
WHERE nbad >= 1
"""


def kw_string_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String keywords over customer, with deterministic 1-in-7 / 1-in-11
    corruption so the oracle asserts non-empty violation sets (TPC-H data
    never violates this schema on its own — a 0-row oracle is vacuous)."""
    schema = {
        "properties": {
            "c_name": {"type": "string", "pattern": "^Customer#[0-9]{9}$", "minLength": 18, "maxLength": 18},
            "c_mktsegment": {
                "enum": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
            },
            "c_acctbal": {"minimum": -999.99},
        }
    }
    c = _t(spark, sf_dir, "customer").withColumns(
        {
            "c_name": F.when(
                F.col("c_custkey") % 7 == 0, F.concat(F.col("c_name"), F.lit("X"))
            ).otherwise(F.col("c_name")),
            "c_mktsegment": F.when(
                F.col("c_custkey") % 11 == 0, F.lit("AEROSPACE")
            ).otherwise(F.col("c_mktsegment")),
        }
    )
    return _violations(c, schema, ["c_custkey"])


ORACLE_STRING_CUSTOMER = """
WITH c AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN c_name || 'X' ELSE c_name END AS c_name,
         CASE WHEN c_custkey % 11 = 0 THEN 'AEROSPACE' ELSE c_mktsegment END AS c_mktsegment,
         c_acctbal
  FROM customer)
SELECT c_custkey, '/c_name' AS instance_path, 'pattern' AS keyword, 'pattern_mismatch' AS code
FROM c WHERE NOT regexp_matches(c_name, '^Customer#[0-9]{9}$')
UNION ALL
SELECT c_custkey, '/c_name', 'minLength', 'string_too_short' FROM c WHERE length(c_name) < 18
UNION ALL
SELECT c_custkey, '/c_name', 'maxLength', 'string_too_long' FROM c WHERE length(c_name) > 18
UNION ALL
SELECT c_custkey, '/c_mktsegment', 'enum', 'value_not_in_enum'
FROM c WHERE c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
UNION ALL
SELECT c_custkey, '/c_acctbal', 'minimum', 'value_below_minimum' FROM c WHERE c_acctbal < -999.99
UNION ALL
SELECT c_custkey, '', 'properties',
       CASE WHEN nbad = 1 THEN 'property_mismatch' ELSE 'properties_mismatch' END
FROM (
  SELECT c_custkey,
         (CASE WHEN NOT regexp_matches(c_name, '^Customer#[0-9]{9}$')
                 OR length(c_name) <> 18 THEN 1 ELSE 0 END)
       + (CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END)
       + (CASE WHEN c_acctbal < -999.99 THEN 1 ELSE 0 END) AS nbad
  FROM c)
WHERE nbad >= 1
"""


def kw_const_ifthen(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = {
        "if": {"properties": {"o_orderstatus": {"const": "O"}}},
        "then": {"properties": {"o_totalprice": {"minimum": 1000}}},
        "else": {"properties": {"o_orderpriority": {"pattern": "^[1-5]-"}}},
    }
    out = SparkPlanCompiler(schema).apply(_t(spark, sf_dir, "orders"))
    return out.select("o_orderkey", "valid")


ORACLE_CONST_IFTHEN = """
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'O' THEN o_totalprice >= 1000
            ELSE regexp_matches(o_orderpriority, '^[1-5]-') END AS valid
FROM orders
"""


def kw_format_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`format` keyword via the compiled rlike path (reference format.go:14-63):
    uuid / date / ipv4 columns constructed deterministically from c_custkey,
    with 1-in-7 / 1-in-11 / 1-in-13 corruption so the oracle is non-vacuous."""
    k = F.col("c_custkey")
    uuid = F.format_string("%08x-0000-4000-8000-%012x", k, k)
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(k % 7 == 0, F.concat(uuid, F.lit("Z"))).otherwise(uuid).alias("u"),
        F.concat(
            F.lit("2024-"),
            F.lpad(F.when(k % 11 == 0, F.lit(13)).otherwise(k % 12 + 1).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((k % 28 + 1).cast("string"), 2, "0"),
        ).alias("d"),
        F.concat_ws(
            ".",
            F.when(k % 13 == 0, F.lit(999)).otherwise(k % 256).cast("string"),
            (F.floor(k / 7) % 256).cast("string"),
            (k % 100).cast("string"),
            (k % 250).cast("string"),
        ).alias("ip"),
    )
    schema = {
        "properties": {
            "u": {"format": "uuid"},
            "d": {"format": "date"},
            "ip": {"format": "ipv4"},
        }
    }
    return _violations(c, schema, ["c_custkey"])


ORACLE_FORMAT_CUSTOMER = """
WITH c AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0
              THEN printf('%08x-0000-4000-8000-%012xZ', c_custkey, c_custkey)
              ELSE printf('%08x-0000-4000-8000-%012x', c_custkey, c_custkey) END AS u,
         '2024-' || lpad(CAST(CASE WHEN c_custkey % 11 = 0 THEN 13 ELSE c_custkey % 12 + 1 END AS VARCHAR), 2, '0')
                 || '-' || lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0') AS d,
         CAST(CASE WHEN c_custkey % 13 = 0 THEN 999 ELSE c_custkey % 256 END AS VARCHAR)
           || '.' || CAST(CAST(FLOOR(c_custkey / 7) AS BIGINT) % 256 AS VARCHAR)
           || '.' || CAST(c_custkey % 100 AS VARCHAR)
           || '.' || CAST(c_custkey % 250 AS VARCHAR) AS ip
  FROM customer),
bad AS (
  SELECT c_custkey,
         (c_custkey % 7 = 0) AS bad_u,
         (c_custkey % 11 = 0) AS bad_d,
         (c_custkey % 13 = 0) AS bad_ip
  FROM c)
SELECT c_custkey, '/u' AS instance_path, 'format' AS keyword, 'format_mismatch' AS code
FROM bad WHERE bad_u
UNION ALL
SELECT c_custkey, '/d', 'format', 'format_mismatch' FROM bad WHERE bad_d
UNION ALL
SELECT c_custkey, '/ip', 'format', 'format_mismatch' FROM bad WHERE bad_ip
UNION ALL
SELECT c_custkey, '', 'properties',
       CASE WHEN nbad = 1 THEN 'property_mismatch' ELSE 'properties_mismatch' END
FROM (
  SELECT c_custkey,
         (CASE WHEN bad_u THEN 1 ELSE 0 END)
       + (CASE WHEN bad_d THEN 1 ELSE 0 END)
       + (CASE WHEN bad_ip THEN 1 ELSE 0 END) AS nbad
  FROM bad)
WHERE nbad >= 1
"""


def kw_prefix_maxitems_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prefixItems + maxItems over the interleaved-spans shape (reference
    prefix_items.go:18-61, max_items.go:16-27): first span must have
    offset <= 200, second span must be kind 'text', and docs are capped at
    70 spans — all three violated by the natural data distribution."""
    schema = {
        "type": "object",
        "required": ["doc_id", "spans"],
        "properties": {
            "spans": {
                "prefixItems": [
                    {"properties": {"offset": {"maximum": 200}}},
                    {"properties": {"kind": {"const": "text"}}},
                ],
                "maxItems": 70,
            }
        },
    }
    return _violations(_events_as_spans(spark, sf_dir), schema, ["doc_id"])


ORACLE_PREFIX_MAXITEMS_SPANS = """
WITH s AS (
  SELECT user_id AS doc_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS pos,
         CAST(FLOOR(value) AS INT) AS off,
         CASE WHEN event_type IN ('click','view') THEN 'text' ELSE 'media' END AS kind
  FROM events),
agg AS (
  SELECT doc_id,
         max(CASE WHEN pos = 0 THEN off END) AS off0,
         max(CASE WHEN pos = 1 THEN kind END) AS kind1,
         count(*) AS n
  FROM s GROUP BY doc_id)
SELECT doc_id, '/spans' AS instance_path, 'maxItems' AS keyword, 'items_too_long' AS code
FROM agg WHERE n > 70
UNION ALL
SELECT doc_id, '/spans/0/offset', 'maximum', 'value_above_maximum' FROM agg WHERE off0 > 200
UNION ALL
SELECT doc_id, '/spans/0', 'properties', 'property_mismatch' FROM agg WHERE off0 > 200
UNION ALL
SELECT doc_id, '/spans/1/kind', 'const', 'const_mismatch' FROM agg WHERE kind1 <> 'text'
UNION ALL
SELECT doc_id, '/spans/1', 'properties', 'property_mismatch' FROM agg WHERE kind1 <> 'text'
UNION ALL
SELECT doc_id, '/spans', 'prefixItems',
       CASE WHEN off0 > 200 AND kind1 <> 'text'
            THEN 'prefix_items_mismatch' ELSE 'prefix_item_mismatch' END
FROM agg WHERE off0 > 200 OR kind1 <> 'text'
UNION ALL
SELECT doc_id, '', 'properties', 'property_mismatch'
FROM agg WHERE n > 70 OR off0 > 200 OR kind1 <> 'text'
"""


def kw_contains_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contains / minContains / maxContains (reference contains.go:18-70):
    every doc must interleave 30..45 media spans — both sides of the band
    are violated by the natural per-user media counts at every SF."""
    schema = {
        "type": "object",
        "properties": {
            "spans": {
                "contains": {"properties": {"kind": {"const": "media"}}},
                "minContains": 30,
                "maxContains": 45,
            }
        },
    }
    return _violations(_events_as_spans(spark, sf_dir), schema, ["doc_id"])


ORACLE_CONTAINS_SPANS = """
WITH m AS (
  SELECT user_id AS doc_id,
         sum(CASE WHEN event_type NOT IN ('click','view') THEN 1 ELSE 0 END) AS nm
  FROM events GROUP BY user_id)
SELECT doc_id, '/spans' AS instance_path, 'contains' AS keyword, 'contains_too_few_items' AS code
FROM m WHERE nm < 30
UNION ALL
SELECT doc_id, '/spans', 'maxContains', 'contains_too_many_items' FROM m WHERE nm > 45
UNION ALL
SELECT doc_id, '', 'properties', 'property_mismatch' FROM m WHERE nm < 30 OR nm > 45
"""


def kw_unevaluated_items_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unevaluatedItems with a prefixItems claim and no `items` (reference
    unevaluated_items.go:23-97): element 0 is evaluated by the empty prefix
    schema; every later span must keep offset <= 300."""
    schema = {
        "type": "object",
        "properties": {
            "spans": {
                "prefixItems": [{}],
                "unevaluatedItems": {"properties": {"offset": {"maximum": 300}}},
            }
        },
    }
    return _violations(_events_as_spans(spark, sf_dir), schema, ["doc_id"])


ORACLE_UNEVALUATED_ITEMS_SPANS = """
WITH s AS (
  SELECT user_id AS doc_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS pos,
         CAST(FLOOR(value) AS INT) AS off
  FROM events),
bad AS (SELECT doc_id, pos FROM s WHERE pos >= 1 AND off > 300)
SELECT doc_id, '/spans/' || pos || '/offset' AS instance_path,
       'maximum' AS keyword, 'value_above_maximum' AS code
FROM bad
UNION ALL
SELECT doc_id, '/spans/' || pos, 'properties', 'property_mismatch' FROM bad
UNION ALL
SELECT doc_id, '/spans', 'unevaluatedItems',
       CASE WHEN count(*) = 1 THEN 'unevaluated_item_mismatch'
            ELSE 'unevaluated_items_mismatch' END
FROM bad GROUP BY doc_id
UNION ALL
SELECT DISTINCT doc_id, '', 'properties', 'property_mismatch' FROM bad
"""


def kw_dependent_required_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dependentRequired over a typed struct column (reference
    dependent_required.go:17-50): presence of `et` demands `p` and `u`,
    which are deterministically nulled for a fraction of events."""
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        F.struct(
            F.col("event_type").alias("et"),
            F.when(F.col("value") > 50, F.col("props")).alias("p"),
            F.when(F.col("event_id") % 3 == 0, F.col("user_id")).alias("u"),
        ).alias("obj"),
    )
    schema = {"properties": {"obj": {"dependentRequired": {"et": ["p", "u"]}}}}
    return _violations(e, schema, ["event_id"])


ORACLE_DEPENDENT_REQUIRED_EVENTS = """
WITH t AS (
  SELECT event_id, (value > 50) AS hasp, (event_id % 3 = 0) AS hasu FROM events)
SELECT event_id, '/obj' AS instance_path, 'dependentRequired' AS keyword,
       'dependent_property_required' AS code
FROM t WHERE NOT hasp OR NOT hasu
UNION ALL
SELECT event_id, '', 'properties', 'property_mismatch' FROM t WHERE NOT hasp OR NOT hasu
"""




def violations_delta_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day violation diff (reporting.violations_delta): the same
    documents schema evaluated on the raw table (the "yesterday" snapshot)
    and on a deterministically perturbed twin (doc_id%5 texts gain a '!'
    breaking the pattern; doc_id%7 n_chars jump +200 over the maximum) —
    every violation labeled new / resolved / persisting. The triage relation
    a recurring validation run feeds to its alerting."""
    from jsonschema_spark.reporting import violations_delta

    schema = {
        "properties": {
            "text": {"pattern": "^[a-z ]+$"},
            "n_chars": {"maximum": 400},
        }
    }
    base = _t(spark, sf_dir, "documents")
    old = _violations(base, schema, ["doc_id"])
    perturbed = base.withColumns(
        {
            "text": F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit("!"))
            ).otherwise(F.col("text")),
            "n_chars": F.when(
                F.col("doc_id") % 7 == 0, F.col("n_chars") + 200
            ).otherwise(F.col("n_chars")),
        }
    )
    new = _violations(perturbed, schema, ["doc_id"])
    return violations_delta(old, new, ["doc_id"])


ORACLE_VIOLATIONS_DELTA = """
WITH o AS (
  SELECT doc_id, '/text' AS instance_path, 'pattern' AS keyword, 'pattern_mismatch' AS code
  FROM documents WHERE NOT regexp_matches(text, '^[a-z ]+$')
  UNION ALL
  SELECT doc_id, '/n_chars', 'maximum', 'value_above_maximum' FROM documents WHERE n_chars > 400
  UNION ALL
  SELECT doc_id, '', 'properties',
         CASE WHEN nbad = 1 THEN 'property_mismatch' ELSE 'properties_mismatch' END
  FROM (
    SELECT doc_id,
           (CASE WHEN NOT regexp_matches(text, '^[a-z ]+$') THEN 1 ELSE 0 END)
         + (CASE WHEN n_chars > 400 THEN 1 ELSE 0 END) AS nbad
    FROM documents)
  WHERE nbad >= 1),
p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || '!' ELSE text END AS text,
         CASE WHEN doc_id % 7 = 0 THEN n_chars + 200 ELSE n_chars END AS n_chars
  FROM documents),
n AS (
  SELECT doc_id, '/text' AS instance_path, 'pattern' AS keyword, 'pattern_mismatch' AS code
  FROM p WHERE NOT regexp_matches(text, '^[a-z ]+$')
  UNION ALL
  SELECT doc_id, '/n_chars', 'maximum', 'value_above_maximum' FROM p WHERE n_chars > 400
  UNION ALL
  SELECT doc_id, '', 'properties',
         CASE WHEN nbad = 1 THEN 'property_mismatch' ELSE 'properties_mismatch' END
  FROM (
    SELECT doc_id,
           (CASE WHEN NOT regexp_matches(text, '^[a-z ]+$') THEN 1 ELSE 0 END)
         + (CASE WHEN n_chars > 400 THEN 1 ELSE 0 END) AS nbad
    FROM p)
  WHERE nbad >= 1)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       COALESCE(o.instance_path, n.instance_path) AS instance_path,
       COALESCE(o.keyword, n.keyword) AS keyword,
       COALESCE(o.code, n.code) AS code,
       CASE WHEN o.doc_id IS NULL THEN 'new'
            WHEN n.doc_id IS NULL THEN 'resolved'
            ELSE 'persisting' END AS status
FROM o FULL OUTER JOIN n
  ON o.doc_id = n.doc_id AND o.instance_path = n.instance_path
 AND o.keyword = n.keyword AND o.code = n.code
"""
