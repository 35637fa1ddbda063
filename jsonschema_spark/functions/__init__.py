from jsonschema_spark.functions.udf import (  # noqa: F401
    validate_json_column,
    valid_flag_udf,
)
