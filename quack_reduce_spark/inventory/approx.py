"""Approximate/sketch aggregates (Tier-B dialect surface; the scale
path for distinct-counting and quantiles at 100 TB).

No SQL oracles: HLL++ and GK-sketch internals are engine-specific, so
DuckDB's approx functions produce different estimates by construction.
Driver gets rows-only checks; tests/test_approx.py bounds the error
against the exact answers instead (the meaningful correctness claim
for sketches).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load


def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct counts per group (vs the exact b_distinct_agg)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        )
    )


def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (GK sketch) with tight accuracy budget."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
            F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
        )
    )


QUERIES = {
    "approx_distinct_counts": approx_distinct_counts,
    "approx_percentiles": approx_percentiles,
}

ORACLES: dict[str, str] = {}
