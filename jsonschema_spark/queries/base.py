"""Query catalog: every operator from SURVEY.md §2 exposed as a
(spark, sf_dir) → DataFrame callable with a DuckDB-equivalent oracle SQL.

These run the *real engine* (plan compiler / UDF path / operators) over the
driver-provided parquet tables; the oracle SQL is an independent hand-written
re-derivation used for the correctness gate. Column names and types are
aligned on both sides (the driver hash-compares sorted columns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsonschema_spark.plans import SparkPlanCompiler


def _t(spark: SparkSession, sf_dir: str, name: str, *, hot: bool = False) -> DataFrame:
    """Load one testdata table.

    ``hot=True`` marks queries whose cost is a CPU-heavy interpreted
    projection (JSON/variant parsing, shingle/minhash/simhash folds): under
    SPARK_GRAFT_SPREAD_SCANS=N (bench sets it to the core count) their scan
    is repartitioned, because the sf* tables are SINGLE row-group parquet
    files that Spark's file-split sizing cannot parallelize — the projection
    would otherwise run in one task. Cheap columnar scans stay unspread (the
    exchange costs more than it saves — measured), and with the env unset
    (driver correctness gate, plan-quality tests, production where inputs
    arrive in thousands of row groups) every plan keeps its narrow
    no-shuffle shape. Filters/pruning push through the repartition either
    way."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if hot:
        spread = int(os.environ.get("SPARK_GRAFT_SPREAD_SCANS", "0"))
        if spread > 0:
            df = df.repartition(spread)
    return df


def _stage_stream_source(sf_dir: str, name: str) -> str:
    """Stage one parquet table for readStream under .scratch/, re-copying
    whenever the source's size or mtime differs from the staged copy — a
    persistent stale copy would silently replay an outdated fixture if the
    testdata were ever regenerated (round-4 advice). copy2 preserves the
    source mtime so the comparison is stable across calls."""
    import shutil

    src = os.path.join(sf_dir, f"{name}.parquet")
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    stage = os.path.join(
        repo_root,
        ".scratch",
        f"stream_{name}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    dst = os.path.join(stage, f"{name}.parquet")
    ss = os.stat(src)
    stale = True
    if os.path.exists(dst):
        ds = os.stat(dst)
        stale = ds.st_size != ss.st_size or int(ds.st_mtime) != int(ss.st_mtime)
    if stale:
        os.makedirs(stage, exist_ok=True)
        shutil.copy2(src, dst)
    return stage


def _violations(df: DataFrame, schema: dict, id_cols: list[str]) -> DataFrame:
    out = SparkPlanCompiler(schema, assert_format=True).apply(df)
    return out.select(*id_cols, F.explode("violations").alias("v")).select(
        *id_cols,
        F.col("v.instance_path").alias("instance_path"),
        F.col("v.keyword").alias("keyword"),
        F.col("v.code").alias("code"),
    )


