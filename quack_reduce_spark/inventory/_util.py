"""Shared helpers for inventory queries."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.functions.numeric import rnd

__all__ = ["load", "register_views", "rnd"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (path-addressed lake scan, SURVEY §2 A1).

    The events table is written with parquet TIMESTAMP(NANOS), which
    Spark's reader rejects by default; read it as nanos-since-epoch
    longs (legacy conf) and truncate to microseconds (`div 1000`, the
    same truncation DuckDB applies reading nanos into its µs TIMESTAMP,
    so oracle comparisons see identical instants).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    """Register fixture tables as temp views for spark.sql-based queries."""
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)
