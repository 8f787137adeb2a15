"""Lake source readers (SURVEY §2 A1/A2 scans + format coverage).

``read_parquet_table`` is the canonical path-addressed scan. It also
absorbs a real-world lake wart: parquet files written with
TIMESTAMP(NANOS) (pandas/pyarrow default), which Spark's vectorized
reader rejects outright. Those columns are read as nanos-since-epoch
longs (legacy conf, runtime-settable) and truncated to microsecond
TimestampType — the same truncation DuckDB applies reading nanos into
its µs TIMESTAMP, so differential oracles see identical instants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def _nanos_columns(path: str) -> list[str]:
    """Names of timestamp[ns] columns per the parquet footer."""
    import pyarrow.dataset as ds

    schema = ds.dataset(path, format="parquet").schema
    return [f.name for f in schema if str(f.type).startswith("timestamp[ns")]


def read_parquet_table(spark: SparkSession, path: str, merge_schema: bool = False) -> DataFrame:
    """Parquet scan (file or hive-partitioned dir) with nanos fallback.

    The nanosAsLong conf is scoped to this call: the prior value is
    restored in a finally block, so other code paths doing plain
    ``spark.read`` keep real timestamp decoding. That is safe because
    Spark captures the conf at DataFrame-creation (schema inference)
    time — the returned (lazy) DataFrame still collects correctly
    after the restore (verified empirically on Spark 4).

    The footer is probed (pyarrow, driver-side, metadata-only) BEFORE
    the Spark read: setting the conf proactively avoids ever surfacing
    the executor-side PARQUET_TYPE_ILLEGAL task failure in logs. The
    catch block stays as a fallback for paths pyarrow can't enumerate
    the same way (e.g. glob patterns).
    """
    _NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(_NANOS_CONF, None)
    try:
        try:
            if _nanos_columns(path):
                spark.conf.set(_NANOS_CONF, "true")
        except Exception:
            pass  # probe is best-effort; the read fallback below still works
        reader = spark.read.option("mergeSchema", "true") if merge_schema else spark.read
        try:
            df = reader.parquet(path)
        except AnalysisException as e:
            if "TIMESTAMP(NANOS" not in str(e):
                raise
            spark.conf.set(_NANOS_CONF, "true")
            df = reader.parquet(path)
        if spark.conf.get(_NANOS_CONF, "false") == "true":
            long_cols = {f.name for f in df.schema.fields if f.dataType.typeName() == "long"}
            try:
                nanos = _nanos_columns(path)
            except Exception:
                nanos = []  # pyarrow can't probe globs/exotic paths; no footer, no conversion
            for name in nanos:
                if name in long_cols:
                    df = df.withColumn(name, F.timestamp_micros(F.expr(f"`{name}` div 1000")))
        return df
    finally:
        if prior is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prior)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", **options: str) -> DataFrame:
    """Format-dispatching lake read (parquet/csv/json/orc/text).

    Versioned table roots (quack_reduce_spark.lake layout, a _CURRENT
    pointer naming the live ``vNNNNNNNN/`` data dir) resolve to the
    version that is live AT READ TIME; the returned DataFrame stays
    bound to that snapshot's files. Engine keeps registered views
    current across later commits (``_refresh_versioned_views`` re-
    resolves the pointer before every sql()/df()); callers holding a
    raw DataFrame re-call read_table to see a newer snapshot."""
    from quack_reduce_spark import lake

    path = lake.resolve(path)
    if fmt == "parquet":
        return read_parquet_table(spark, path)
    reader = spark.read.options(**options)
    if fmt == "csv" and "header" not in options:
        reader = reader.option("header", "true").option("inferSchema", "true")
    return reader.format(fmt).load(path)
