"""Bucketed co-located joins (100 TB design): pre-bucketing both sides
on the join key removes the shuffle from every subsequent join — the
lake-layout lever the reference could not express (its partitioning is
date-only, run_me_first.py:83-100)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.plans import executed_plan


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(wh / "orders_b"))  # external table: explicit path
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        customer.withColumnRenamed("c_custkey", "o_custkey")
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(wh / "customer_b"))
        .mode("overwrite")
        .saveAsTable("customer_b")
    )
    yield spark.table("orders_b"), spark.table("customer_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, customer_b = bucketed
    # force a non-broadcast join so the shuffle (or its absence) shows
    joined = orders_b.hint("merge").join(customer_b, "o_custkey")
    plan = executed_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed):
    orders_b, customer_b = bucketed
    got = (
        orders_b.join(customer_b, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    want = (
        orders.join(customer, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {tuple(r) for r in got} == {tuple(r) for r in want}
