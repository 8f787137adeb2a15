"""Tier-B batch 4: extreme-value aggregates, array set algebra, and
window-qualify filtering.

All reachable in the reference only through its SQL passthrough
(``app.py:51`` — SURVEY §2 Tier B); here each is a first-class
DataFrame query with an exact DuckDB oracle.

Scale shape: every query is a single partial/final hash aggregate or
a per-key window — no joins over the fact table, nothing quadratic.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from quack_reduce_spark.inventory._util import load, register_views, rnd

_RT_CACHE = "/tmp/quack_reduce_spark_roundtrip"


def b3_extreme_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value / decision aggregates per order priority: argmax
    and argmin (max_by/min_by), exact interpolated median, bool_and /
    bool_or quantifiers, and count_if. The fixtures have no totalprice
    ties at group extremes (checked), so max_by/min_by are
    deterministic."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("top_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("bottom_order"),
            rnd(F.median("o_totalprice"), 4).alias("median_price"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_above_400k"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        )
        .orderBy("o_orderpriority")
    )


_VOCAB = ["the", "a", "table", "query", "spark"]


def b3_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: each document's token set vs a fixed probe
    vocabulary — union / intersect / except, sorted and re-serialized
    (scalar output keeps the differential hash engine-portable).
    Everything is a narrow per-row projection — zero shuffles."""
    docs = load(spark, sf_dir, "documents")
    a = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    b = F.array(*[F.lit(v) for v in _VOCAB])
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("tok_union"),
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias("tok_intersect"),
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias("tok_except"),
        F.array_size(F.array_union(a, b)).alias("n_union"),
        F.array_contains(a, "spark").alias("mentions_spark"),
    )


def b3_window_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price (deterministic
    orderkey tiebreak) — the QUALIFY-clause pattern of the reference
    dialect, expressed as window + filter; Spark plans the rank filter
    as a WindowGroupLimit (top-k per partition, no full materialized
    rank column) which is the shape that matters at 100 TB."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def _rt_dir(sf_dir: str, tag: str) -> str:
    return os.path.join(_RT_CACHE, os.path.basename(os.path.normpath(sf_dir)), tag)


_HIVE_MATERIALIZED: set[str] = set()


def a02_hive_partition_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A2+A3 as a registry query: lineitem re-laid-out hive-
    partitioned by ship month (the reference's run_me_first.py:83-100
    layout), re-read with partition discovery, and pruned by a
    partition-column filter — the scan touches 3/12 month directories
    (plan-asserted in test_plans.py; the oracle computes the same
    answer from the unpartitioned original, so discovery + pruning +
    partition-column-to-data agreement are all hash-verified). The
    layout is written once per process (immutable fixture)."""
    out = _rt_dir(sf_dir, "lineitem_hive")
    if out not in _HIVE_MATERIALIZED:
        li = load(spark, sf_dir, "lineitem").withColumn(
            "ship_month", F.month("l_shipdate")
        )
        li.write.partitionBy("ship_month").mode("overwrite").parquet(out)
        _HIVE_MATERIALIZED.add(out)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("ship_month").isin(1, 2, 3))
        .groupBy("ship_month", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
        .orderBy("ship_month", "l_returnflag")
    )


def b3_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source through the differential gate: nation written
    as headered CSV, read back with the EXPLICIT original schema (no
    inference — the 100 TB discipline), aggregated; the oracle computes
    from the original parquet, so a hash match proves the roundtrip is
    lossless (quoting included — n_comment contains free text)."""
    nation = load(spark, sf_dir, "nation")
    out = _rt_dir(sf_dir, "nation_csv")
    nation.write.mode("overwrite").option("header", "true").csv(out)
    back = spark.read.schema(nation.schema).option("header", "true").csv(out)
    return (
        back.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_name").alias("first_name"),
            F.sum("n_nationkey").alias("sum_key"),
        )
        .orderBy("n_regionkey")
    )


def b3_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source roundtrip (timestamps and doubles
    included): orders written as JSON, read back with the explicit
    schema, aggregated; oracle from the original parquet — proving
    ISO-timestamp and double serialization are bit-faithful."""
    orders = load(spark, sf_dir, "orders")
    out = _rt_dir(sf_dir, "orders_json")
    orders.write.mode("overwrite").json(out)
    back = spark.read.schema(orders.schema).json(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("o_totalprice").alias("max_price"),
            F.max("o_orderdate").alias("last_date"),
        )
        .orderBy("o_orderstatus")
    )


_GROUP_BY_ALL_SQL = """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           MIN(l_orderkey) AS min_key,
           MAX(l_orderkey) AS max_key
    FROM lineitem
    WHERE l_quantity < 30
    GROUP BY ALL
    ORDER BY ALL
"""


def b3_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — the dialect-convenience grouping
    the reference's engine popularized; the IDENTICAL SQL text runs on
    both engines (Spark 4 and the oracle both resolve ALL to the
    non-aggregate select items)."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_GROUP_BY_ALL_SQL)


_LATERAL_SQL = """
    SELECT o.o_orderkey, o.o_totalprice, l.n_lines, l.max_qty
    FROM orders o,
    LATERAL (
        SELECT COUNT(*) AS n_lines, MAX(l_quantity) AS max_qty
        FROM lineitem WHERE l_orderkey = o.o_orderkey
    ) l
    WHERE o.o_orderkey < 500
    ORDER BY o.o_orderkey
"""


def b3_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery join — the IDENTICAL SQL text runs
    on both engines; Catalyst decorrelates the per-row aggregate into
    a keyed join (DecorrelateInnerQuery), so despite the row-at-a-time
    surface syntax the physical plan is one aggregate + one join on
    l_orderkey."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_LATERAL_SQL)


def b3_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source roundtrip (the third columnar format in the
    reader matrix): customer written as ORC, read back, aggregated;
    oracle from the original parquet — the roundtrip must be lossless
    including doubles (ORC stores IEEE doubles bit-exactly)."""
    customer = load(spark, sf_dir, "customer")
    out = _rt_dir(sf_dir, "customer_orc")
    customer.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum("c_acctbal"), 4).alias("sum_bal"),
            F.min("c_custkey").alias("first_cust"),
        )
        .orderBy("c_mktsegment")
    )


QUERIES = {
    "a02_hive_partition_scan": a02_hive_partition_scan,
    "b3_orc_roundtrip": b3_orc_roundtrip,
    "b3_group_by_all": b3_group_by_all,
    "b3_lateral_join": b3_lateral_join,
    "b3_extreme_aggs": b3_extreme_aggs,
    "b3_array_setops": b3_array_setops,
    "b3_window_qualify": b3_window_qualify,
    "b3_csv_roundtrip": b3_csv_roundtrip,
    "b3_json_roundtrip": b3_json_roundtrip,
}


ORACLES = {
    "a02_hive_partition_scan": """
        SELECT CAST(EXTRACT(month FROM l_shipdate) AS INT) AS ship_month,
               l_returnflag,
               COUNT(*) AS n,
               FLOOR((SUM(l_quantity)) * 1e4 + 0.5) / 1e4 AS sum_qty
        FROM lineitem
        WHERE EXTRACT(month FROM l_shipdate) IN (1, 2, 3)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "b3_group_by_all": _GROUP_BY_ALL_SQL,
    "b3_lateral_join": _LATERAL_SQL,
    "b3_extreme_aggs": """
        SELECT o_orderpriority,
               arg_max(o_orderkey, o_totalprice) AS top_order,
               arg_min(o_orderkey, o_totalprice) AS bottom_order,
               FLOOR((median(o_totalprice)) * 1e4 + 0.5) / 1e4 AS median_price,
               bool_and(o_totalprice > 1000) AS all_above_1k,
               bool_or(o_totalprice > 400000) AS any_above_400k,
               CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "b3_array_setops": """
        WITH t AS (
            SELECT doc_id,
                   list_distinct(string_split_regex(trim(text), '\\s+')) AS a,
                   ['the', 'a', 'table', 'query', 'spark'] AS b
            FROM documents
        )
        SELECT doc_id,
               array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS tok_union,
               -- array_to_string([]) is NULL in the oracle dialect; Spark's array_join gives ''
               COALESCE(array_to_string(list_sort(list_distinct(list_intersect(a, b))), ','), '') AS tok_intersect,
               COALESCE(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS tok_except,
               CAST(len(list_distinct(list_concat(a, b))) AS INT) AS n_union,
               list_contains(a, 'spark') AS mentions_spark
        FROM t
    """,
    "b3_orc_roundtrip": """
        SELECT c_mktsegment,
               COUNT(*) AS n,
               FLOOR((SUM(c_acctbal)) * 1e4 + 0.5) / 1e4 AS sum_bal,
               MIN(c_custkey) AS first_cust
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "b3_csv_roundtrip": """
        SELECT n_regionkey,
               COUNT(*) AS n,
               MIN(n_name) AS first_name,
               CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
    """,
    "b3_json_roundtrip": """
        SELECT o_orderstatus,
               COUNT(*) AS n,
               MAX(o_totalprice) AS max_price,
               MAX(o_orderdate) AS last_date
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "b3_window_qualify": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
        FROM orders
        QUALIFY rk <= 3
    """,
}
