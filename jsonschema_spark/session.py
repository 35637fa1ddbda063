"""Engine-recommended Spark session configuration.

One source of truth for the confs every jsonschema_spark entrypoint (bench,
job runner, tests) should run with, so plan shapes in tests match production.
"""

from __future__ import annotations

ENGINE_CONFS: dict[str, str] = {
    # InferFiltersFromGenerate synthesizes `size(violations) > 0` below the
    # staging projection, substituting the FULL un-staged violation tree into
    # a non-codegen Filter — every constraint predicate then re-evaluates
    # interpreted (~10x per row on summary-row schemas, the measured r2
    # kw_numeric_lineitem 3.26x regression). explode() already skips empty
    # arrays at zero cost, and every Generate in this engine consumes a
    # computed array column, so the inferred filter is pure loss here.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    # runtime re-planning: partition coalescing + skew-join splitting
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def apply_engine_confs(builder):
    """Apply ENGINE_CONFS to a SparkSession.Builder (returns the builder)."""
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    return builder
