"""Approximate aggregates: error-bounded vs exact (the meaningful check
for sketches — engine-specific internals can't oracle-match DuckDB).
Salted join: result equivalence with the plain join."""

from __future__ import annotations

import pyspark.sql.functions as F

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.inventory.approx import approx_distinct_counts, approx_percentiles
from quack_reduce_spark.operators.skew import salted_join


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = {r["l_returnflag"]: r["approx_parts"] for r in approx_distinct_counts(spark, sf_dir).collect()}
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(3, 0.1 * exact[k]), (k, est, exact[k])


def test_approx_percentile_brackets_exact(spark, sf_dir):
    approx = {r["o_orderstatus"]: r["p50"] for r in approx_percentiles(spark, sf_dir).collect()}
    exact = {
        r["o_orderstatus"]: r["p50"]
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("p50"))
        .collect()
    }
    for k, est in approx.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # salted_join joins on a shared column name
    salted = (
        salted_join(
            orders.withColumnRenamed("o_custkey", "custkey"),
            customer.withColumnRenamed("c_custkey", "custkey"),
            on="custkey",
            salt_buckets=4,
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_left_preserves_unmatched(spark, sf_dir):
    customer = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    none_orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") < 0)  # empty dim
        .withColumnRenamed("o_custkey", "custkey")
    )
    out = salted_join(customer, none_orders, on="custkey", how="left")
    assert out.count() == customer.count()
