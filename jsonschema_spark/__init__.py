"""jsonschema_spark — a PySpark-native JSON Schema / constraint validation engine.

A from-scratch, Spark-first re-expression of the capabilities of the
kaptinlin/jsonschema reference validator (Go, per-document interpreter):

- ``jsonschema_spark.evaluator`` — clean-room Draft 2020-12 evaluator used for
  scalar conformance and as the Arrow-batched pandas-UDF residue for dynamic
  JSON columns (never per-row Python in the DataFrame hot path).
- ``jsonschema_spark.plans`` — the constraint-plan compiler: JSON Schema over a
  *typed* Spark schema lowers to pure ``pyspark.sql.Column`` boolean
  expressions + violation-row constructors (whole-stage-codegen friendly).
- ``jsonschema_spark.operators`` — dataset-level checks (column stats, HLL
  cardinality, key uniqueness, referential integrity, KS/PSI drift,
  span-sequence equality) and training-data ops (dedup, similarity search,
  text analysis, multimodal plumbing).
- ``jsonschema_spark.sources`` / ``sinks`` — readers/writers incl. exact-number
  JSON ingestion and the checkpoint/lineage protocol for resumable runs.
- ``jsonschema_spark.streaming`` — Structured Streaming validation.

Error codes mirror the reference catalog (reference: i18n/locales/en.json) —
codes, not message strings, are the compatibility contract.
"""

__version__ = "0.1.0"

from jsonschema_spark.compat import schema_compat  # noqa: F401
from jsonschema_spark.compiler import Compiler, compile_schema  # noqa: F401
from jsonschema_spark.evaluator import EvaluationResult  # noqa: F401
