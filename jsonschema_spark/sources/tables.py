"""Table IO abstraction: parquet today, Iceberg when a catalog is configured.

The engine's commit protocol (runner.py) needs three table capabilities:
scan with pruning, partitioned write, and atomic visibility of a completed
partition. Iceberg gives all three natively (snapshot commits); on plain
parquet the runner emulates the commit with staging dirs + lineage markers.
This class is the seam: point `fmt` at "iceberg" (with a configured catalog)
and the same call sites produce catalog tables with snapshot semantics.

Reference analogue: the validator core is storage-agnostic; sources/sinks are
adapters (compiler.go media-type handlers are the schema-side equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, fmt: str = "parquet"):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError(f"unsupported table format: {fmt}")
        self.spark = spark
        self.fmt = fmt

    def read(self, path_or_table: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.table(path_or_table)
        return self.spark.read.parquet(path_or_table)

    def write(self, df: DataFrame, path_or_table: str, *, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        if self.fmt == "iceberg":
            w.saveAsTable(path_or_table)
        else:
            w.parquet(path_or_table)

    def append(self, df: DataFrame, path_or_table: str) -> None:
        self.write(df, path_or_table, mode="append")
