"""Shared helpers for inventory queries."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.functions.numeric import rnd

__all__ = ["load", "register_views", "rnd"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (path-addressed lake scan, SURVEY §2 A1).

    Delegates to sources.read_parquet_table, which normalizes
    TIMESTAMP(NANOS) columns (the events table) to µs TimestampType
    with DuckDB-identical truncation.
    """
    from quack_reduce_spark.sources import read_parquet_table

    return read_parquet_table(spark, f"{sf_dir.rstrip('/')}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    """Register fixture tables as temp views for spark.sql-based queries."""
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)
