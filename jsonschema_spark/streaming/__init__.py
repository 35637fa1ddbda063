from jsonschema_spark.streaming.anomaly_stream import stream_volume_anomaly
from jsonschema_spark.streaming.drift_stream import stream_js, stream_ks, stream_psi
from jsonschema_spark.streaming.referential_stream import (
    stream_referential_metrics,
    stream_referential_violations,
)
from jsonschema_spark.streaming.sessions_stream import stream_sessionize
from jsonschema_spark.streaming.sketch_stream import stream_hll_windows
from jsonschema_spark.streaming.validate_stream import (
    stream_keyword_metrics,
    stream_violation_metrics,
    validate_stream,
)

__all__ = [
    "validate_stream",
    "stream_violation_metrics",
    "stream_keyword_metrics",
    "stream_psi",
    "stream_volume_anomaly",
    "stream_ks",
    "stream_js",
    "stream_sessionize",
    "stream_referential_violations",
    "stream_referential_metrics",
    "stream_hll_windows",
]
