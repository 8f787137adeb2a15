"""File-level zone maps: a min/max stats manifest + data-skipping scan.

Parquet footers already carry per-row-group min/max statistics, but a
100 TB table is *thousands of files*, and the scan planner must still
LIST and open every footer to discover that 99% of them cannot match a
selective predicate. Table formats (Iceberg manifests, Delta
``add``-action stats) fix this by hoisting per-FILE min/max into a
small metadata artifact read once at planning time. This module
rebuilds that mechanism on plain parquet:

- :func:`write_zonemap` aggregates per-file ``(n_rows, min, max,
  n_null)`` for chosen columns in ONE distributed pass over the table
  (grouping on the hidden ``_metadata.file_path`` column) and writes
  the manifest under ``<table>/_zonemap/`` — an underscore-prefixed
  directory, which Spark's file index treats as hidden, so normal
  table scans never see it.
- :func:`prune_files` evaluates a closed-interval predicate
  ``lo <= col <= hi`` against the manifest only: a file survives iff
  its ``[min, max]`` interval intersects ``[lo, hi]`` (an all-NULL
  file has NULL min/max and is skipped — a range predicate cannot
  match NULL).
- :func:`scan_pruned` reads ONLY the surviving files and re-applies
  the exact predicate (zone maps prune, they never filter), so the
  result is row-for-row identical to a full-table filter — the
  invariant ``tests/test_zonemaps.py`` verifies on sorted, random,
  and z-ordered layouts.

Scale notes. The manifest build is one map-side-combinable aggregate
keyed on file path — #files output rows regardless of table size; the
manifest itself is a parquet file of #files rows, so planning reads
KILOBYTES where footer-probing reads thousands of round trips. Only
the SURVIVING file paths are collected to the driver (the standard
planning cost every table format pays; Iceberg's answer for
million-file tables — partition-level manifest grouping — composes
here too: zone maps nest under hive partition pruning since paths
keep their partition directories). Pruning power is a *layout*
property: clustering the write by the filter column
(``repartitionByRange`` + ``sortWithinPartitions``, or
:func:`~quack_reduce_spark.operators.zorder.zorder_write` for two
dimensions) gives each file a tight bounding box; a random layout
degrades gracefully to reading everything — never to a wrong answer.

The reference has no stats layer at all — its serverless engine
re-lists and re-opens objects per query (``quack.py:145``,
``benchmark.py:45``) and its README defers table formats
(``README.md:190``); this closes the same gap the lake.py commit
protocol does, from the read-planning side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

ZONEMAP_DIR = "_zonemap"


def zonemap_stats(spark: SparkSession, data_dir: str, cols: list[str]) -> DataFrame:
    """Per-file stats frame for ``cols``: one row per parquet file with
    ``n_rows`` plus ``min_<c>``, ``max_<c>``, ``nulls_<c>`` per column,
    natively typed (dates stay dates, doubles stay doubles). Single
    partial/final aggregate onto #files keys — the only full-table
    pass zone maps ever make."""
    df = spark.read.parquet(data_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"))
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def write_zonemap(spark: SparkSession, data_dir: str, cols: list[str]) -> int:
    """Build and persist the manifest at ``<data_dir>/_zonemap``
    (single parquet file — it has #files rows). Returns the number of
    data files covered. Rebuild after any rewrite of the table; the
    versioned-lake integration gets this for free because version
    directories are immutable (stats written once per version can
    never go stale)."""
    stats = zonemap_stats(spark, data_dir, cols)
    stats.coalesce(1).write.mode("overwrite").parquet(f"{data_dir}/{ZONEMAP_DIR}")
    return stats.count()


def read_zonemap(spark: SparkSession, data_dir: str) -> DataFrame:
    return spark.read.parquet(f"{data_dir}/{ZONEMAP_DIR}")


def has_zonemap(data_dir: str) -> bool:
    from quack_reduce_spark.lake import _fs_for, _join

    return _fs_for(data_dir).is_dir(_join(data_dir, ZONEMAP_DIR))


def _data_files(data_dir: str) -> list[str]:
    """Recursive parquet-file listing under ``data_dir`` (hive
    partition subdirs included), skipping hidden ``_``/``.`` names —
    the same visibility rule Spark's file index applies. Goes through
    the lake's filesystem dispatch, so URI paths (s3a/hdfs/file:) walk
    the Hadoop FileSystem like every other metadata op."""
    from quack_reduce_spark.lake import _fs_for, _join

    fs = _fs_for(data_dir)
    out: list[str] = []
    stack = [data_dir.rstrip("/")]
    while stack:
        d = stack.pop()
        for name in fs.list_names(d):
            if name.startswith(("_", ".")):
                continue
            p = _join(d, name)
            if fs.is_dir(p):
                stack.append(p)
            elif name.endswith(".parquet"):
                out.append(p)
    return out


def append_zonemap(spark: SparkSession, data_dir: str, cols: list[str]) -> int:
    """Incremental manifest maintenance after an APPEND: stat only the
    files not yet covered (read directly by path — the existing
    files' rows are never rescanned), union with the old manifest,
    rewrite. Returns the number of NEW files statted. The manifest
    rewrite itself is #files rows — noise. This is the Iceberg
    append-commit shape: immutable data files mean old stats can
    never go stale, so maintenance cost tracks the DELTA, not the
    table (the same argument as dedup_lsh_index_probe's flat probe)."""
    old = read_zonemap(spark, data_dir)
    # manifest paths carry the scheme Spark's file index reported
    # (file:/...); normalize both sides to scheme-less for the diff
    def bare(p: str) -> str:
        return p.split("://")[-1].removeprefix("file:")

    known = {bare(r["file"]) for r in old.select("file").collect()}
    new_files = [p for p in _data_files(data_dir) if bare(p) not in known]
    if not new_files:
        return 0
    # basePath keeps hive partition columns resolvable when reading
    # explicit file paths, so partition columns remain valid stats_cols
    df = spark.read.option("basePath", data_dir).parquet(*new_files)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"))
    fresh = (
        df.select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )
    merged = old.unionByName(fresh)
    # write-then-swap: localCheckpoint pins the old manifest's rows in
    # memory so the overwrite cannot clobber the frame mid-read
    merged = merged.localCheckpoint()
    merged.coalesce(1).write.mode("overwrite").parquet(f"{data_dir}/{ZONEMAP_DIR}")
    return len(new_files)


def prune_files(
    spark: SparkSession,
    data_dir: str,
    col: str,
    lo=None,
    hi=None,
) -> tuple[list[str], int]:
    """File paths whose ``[min_col, max_col]`` interval can intersect
    the closed interval ``[lo, hi]`` (either bound may be None for a
    one-sided range), plus the total file count. All-NULL files (NULL
    min/max) are pruned: no value in them can satisfy a range
    predicate. The manifest is #files rows, so this collect is the
    bounded planning step, not row data."""
    zm = read_zonemap(spark, data_dir)
    cond = F.col(f"min_{col}").isNotNull()
    if lo is not None:
        cond = cond & (F.col(f"max_{col}") >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(f"min_{col}") <= F.lit(hi))
    total = zm.count()
    files = [r["file"] for r in zm.filter(cond).select("file").collect()]
    return files, total


def scan_pruned(
    spark: SparkSession,
    data_dir: str,
    col: str,
    lo=None,
    hi=None,
) -> tuple[DataFrame, int, int]:
    """Range scan with manifest-level file skipping: returns
    ``(frame, files_read, files_total)`` where ``frame`` is exactly
    ``read(data_dir).filter(lo <= col <= hi)`` — the predicate is
    re-applied to surviving files, so zone-map granularity can only
    cost reads, never correctness."""
    files, total = prune_files(spark, data_dir, col, lo, hi)
    if files:
        # basePath keeps hive partition columns resolvable when the
        # survivors are read by explicit path
        df = spark.read.option("basePath", data_dir).parquet(*files)
    else:
        df = spark.read.parquet(data_dir).limit(0)
    pred = F.col(col).isNotNull()
    if lo is not None:
        pred = pred & (F.col(col) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(col) <= F.lit(hi))
    return df.filter(pred), len(files), total
