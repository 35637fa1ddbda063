from jsonschema_spark.operators.stats import column_stats, column_cardinality  # noqa: F401
from jsonschema_spark.operators.uniqueness import duplicate_keys, uniqueness_check  # noqa: F401
from jsonschema_spark.operators.referential import referential_violations, referential_check  # noqa: F401
from jsonschema_spark.operators.drift import ks_statistic, psi  # noqa: F401
from jsonschema_spark.operators.spans import (  # noqa: F401
    salted_repartition,
    span_sequence_mismatches,
    explode_spans,
)
