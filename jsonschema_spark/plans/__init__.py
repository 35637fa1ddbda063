from jsonschema_spark.plans.columns import (  # noqa: F401
    SparkPlanCompiler,
    VIOLATION_SCHEMA_DDL,
    validate_dataframe,
)
