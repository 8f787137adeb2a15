"""Data-quality validation inventory: expectation suites, referential
integrity, and partition-level freshness/completeness profiling.

The gate between "data landed" and "data is trainable": a 100 TB
ingest that silently carries null keys, duplicate rows, or orphaned
foreign keys poisons every downstream join and dedup pass. These
queries are the Great-Expectations / dbt-test surface expressed as
plain DataFrame algebra — each suite is a handful of single-pass
aggregates (count_if inside one scan, never one scan per check) plus
anti-join counts for referential integrity, so the cost at scale is
one read of each audited table.

All three queries are fully SQL-expressible and hash-oracled; the
point of putting them through the differential gate is that the
violation COUNTS are exact contracts, not heuristics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load, rnd


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over orders + lineitem: key not-null, key
    uniqueness, accepted values, value ranges — ONE aggregate pass per
    table (count_if batteries), emitted as one row per check with the
    violation count and a pass flag.

    r17 shape: the six check rows EXPLODE from one literal struct
    array over the crossJoin of the two one-row aggregates. The former
    unionByName of six per-check selects referenced the ``o``
    aggregate 4x and ``l`` 2x, and Spark re-evaluates every reference
    — the physical plan scanned orders four times and lineitem twice
    (plans/r17/dq_expectations_before.txt). Now each table is scanned
    once (guide §2.4: remove repeated passes outright); the checks are
    row-local expression work on a single 1x1 row. Output identical:
    same six rows, names, types, order."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    o = orders.agg(
        F.count(F.lit(1)).alias("o_n"),
        F.count_if(F.col("o_orderkey").isNull()).alias("null_key"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "dup_key"
        ),
        F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "bad_status"
        ),
        F.count_if(F.col("o_totalprice") <= 0).alias("bad_price"),
    )
    l = li.agg(
        F.count(F.lit(1)).alias("l_n"),
        F.count_if(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ).alias("bad_qty"),
        F.count_if(F.col("l_discount") > F.lit(0.5)).alias("bad_discount"),
    )

    def check(name: str, n_col: str, v_col: str):
        return F.struct(
            F.lit(name).alias("check_name"),
            F.col(n_col).cast("long").alias("n_checked"),
            F.col(v_col).cast("long").alias("n_violations"),
        )

    checks = F.array(
        check("orders_key_not_null", "o_n", "null_key"),
        check("orders_key_unique", "o_n", "dup_key"),
        check("orders_status_accepted", "o_n", "bad_status"),
        check("orders_price_positive", "o_n", "bad_price"),
        check("lineitem_qty_in_range", "l_n", "bad_qty"),
        check("lineitem_discount_sane", "l_n", "bad_discount"),
    )
    return (
        o.crossJoin(l)
        .select(F.explode(checks).alias("c"))
        .select(
            F.col("c.check_name").alias("check_name"),
            F.col("c.n_checked").alias("n_checked"),
            F.col("c.n_violations").alias("n_violations"),
            (F.col("c.n_violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key audits as anti-join counts: orders→customer,
    lineitem→orders, lineitem→part, lineitem→supplier. Each check is
    one anti-join on the key (broadcast when the parent fits, AQE
    decides); the violation count being exactly 0 is the contract
    every downstream inner join silently assumes."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")

    def fk(child: DataFrame, ck: str, parent: DataFrame, pk: str, name: str):
        orphans = child.join(
            parent.select(F.col(pk).alias(ck)), on=ck, how="left_anti"
        )
        return child.agg(F.count(F.lit(1)).alias("n")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("v"))
        ).select(
            F.lit(name).alias("relation"),
            F.col("n").cast("long").alias("n_child_rows"),
            F.col("v").cast("long").alias("n_orphans"),
            (F.col("v") == 0).alias("intact"),
        )

    return (
        fk(orders, "o_custkey", cust, "c_custkey", "orders->customer")
        .unionByName(fk(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders"))
        .unionByName(fk(li, "l_partkey", part, "p_partkey", "lineitem->part"))
        .unionByName(fk(li, "l_suppkey", supp, "s_suppkey", "lineitem->supplier"))
        .orderBy("relation")
    )


def dq_partition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month completeness/freshness profile of orders: row count,
    distinct customers, span of order dates inside the bucket, price
    stats, and null rates — the per-partition health table an ingest
    pipeline diffs against yesterday's to catch a short-loaded or
    stale partition before training reads it."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("o_custkey").alias("n_customers"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
            rnd(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.count_if(F.col("o_totalprice").isNull()).alias("null_prices"),
        )
        .orderBy("month")
    )


QUERIES = {
    "dq_expectations": dq_expectations,
    "dq_referential_integrity": dq_referential_integrity,
    "dq_partition_profile": dq_partition_profile,
}

ORACLES = {
    "dq_expectations": """
        WITH o AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) FILTER (o_orderkey IS NULL) AS BIGINT)
                       AS null_key,
                   CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                       AS dup_key,
                   CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('O','F','P'))
                        AS BIGINT) AS bad_status,
                   CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT)
                       AS bad_price
            FROM orders
        ),
        l AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) FILTER (l_quantity < 1 OR l_quantity > 50)
                        AS BIGINT) AS bad_qty,
                   CAST(COUNT(*) FILTER (l_discount > 0.5) AS BIGINT)
                       AS bad_discount
            FROM lineitem
        )
        SELECT 'orders_key_not_null' AS check_name, n AS n_checked,
               null_key AS n_violations, null_key = 0 AS passed FROM o
        UNION ALL
        SELECT 'orders_key_unique', n, dup_key, dup_key = 0 FROM o
        UNION ALL
        SELECT 'orders_status_accepted', n, bad_status, bad_status = 0 FROM o
        UNION ALL
        SELECT 'orders_price_positive', n, bad_price, bad_price = 0 FROM o
        UNION ALL
        SELECT 'lineitem_qty_in_range', n, bad_qty, bad_qty = 0 FROM l
        UNION ALL
        SELECT 'lineitem_discount_sane', n, bad_discount, bad_discount = 0
        FROM l
        ORDER BY check_name
    """,
    "dq_referential_integrity": """
        WITH checks AS (
            SELECT 'orders->customer' AS relation,
                   (SELECT COUNT(*) FROM orders) AS n_child_rows,
                   (SELECT COUNT(*) FROM orders
                    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
                       AS n_orphans
            UNION ALL
            SELECT 'lineitem->orders',
                   (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM lineitem
                    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
            UNION ALL
            SELECT 'lineitem->part',
                   (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM lineitem
                    WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
            UNION ALL
            SELECT 'lineitem->supplier',
                   (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM lineitem
                    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
        )
        SELECT relation,
               CAST(n_child_rows AS BIGINT) AS n_child_rows,
               CAST(n_orphans AS BIGINT) AS n_orphans,
               n_orphans = 0 AS intact
        FROM checks
        ORDER BY relation
    """,
    "dq_partition_profile": """
        SELECT date_trunc('month', o_orderdate) AS month,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               MIN(o_orderdate) AS first_date,
               MAX(o_orderdate) AS last_date,
               FLOOR((AVG(o_totalprice)) * 1e4 + 0.5) / 1e4 AS avg_price,
               CAST(COUNT(*) FILTER (o_totalprice IS NULL) AS BIGINT)
                   AS null_prices
        FROM orders
        GROUP BY 1
        ORDER BY month
    """,
}
