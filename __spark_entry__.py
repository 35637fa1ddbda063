"""Driver contract for the spark-graft builder (PySpark target).

entry() = flagship validation query; queries()/oracle_sql() = the operator
catalog from SURVEY.md §2 with DuckDB oracles (see the jsonschema_spark/queries/ package).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compile the documents constraint schema to a pure-Column plan
    and emit violation rows over /root/testdata/sf0.001."""
    from jsonschema_spark.queries import validate_documents_violations

    return validate_documents_violations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jsonschema_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from jsonschema_spark.queries import all_oracles

    return all_oracles()
