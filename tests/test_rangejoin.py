"""Banded range join: equivalence to the naive inequality join, plan
shape (no nested loop), and overlap-join dedup correctness."""

from __future__ import annotations

import pyspark.sql.functions as F

from quack_reduce_spark import plans
from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)


def _intervals(spark, sf_dir):
    return load(spark, sf_dir, "nation").select(
        "n_nationkey",
        (F.lit(-1000.0) + F.col("n_nationkey") * 440.0).alias("lo"),
        (F.lit(-1000.0) + F.col("n_nationkey") * 440.0 + 880.0).alias("hi"),
    )


def test_banded_equals_naive_inequality_join(spark, sf_dir):
    customer = load(spark, sf_dir, "customer")
    ivs = _intervals(spark, sf_dir)
    banded = {
        (r["c_custkey"], r["n_nationkey"])
        for r in point_in_interval_join(
            customer, ivs, "c_acctbal", "lo", "hi", band_width=440.0
        ).collect()
    }
    naive = {
        (r["c_custkey"], r["n_nationkey"])
        for r in customer.join(
            ivs, (F.col("c_acctbal") >= F.col("lo")) & (F.col("c_acctbal") < F.col("hi"))
        ).collect()
    }
    assert banded == naive
    assert banded  # fixture must produce matches


def test_banded_plan_has_no_nested_loop(spark, sf_dir):
    customer = load(spark, sf_dir, "customer")
    ivs = _intervals(spark, sf_dir)
    banded_plan = plans.formatted_plan(
        point_in_interval_join(customer, ivs, "c_acctbal", "lo", "hi", band_width=440.0)
    )
    assert "BroadcastNestedLoopJoin" not in banded_plan
    naive_plan = plans.formatted_plan(
        customer.join(
            ivs, (F.col("c_acctbal") >= F.col("lo")) & (F.col("c_acctbal") < F.col("hi"))
        )
    )
    assert "BroadcastNestedLoopJoin" in naive_plan  # what banding replaces


def test_overlap_join_matches_naive(spark):
    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 6.0), (3, 20.0, 30.0)], "lid long, ls double, le double"
    )
    right = spark.createDataFrame(
        [(10, 8.0, 25.0), (20, -5.0, 0.5), (30, 29.0, 40.0)], "rid long, rs double, re double"
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(left, right, "ls", "le", "rs", "re", 7.0).collect()
    }
    want = {
        (r["lid"], r["rid"])
        for r in left.join(
            right, (F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le"))
        ).collect()
    }
    assert got == want
    # each overlapping pair appears exactly once despite multi-band overlap
    rows = interval_overlap_join(left, right, "ls", "le", "rs", "re", 7.0).collect()
    assert len(rows) == len(got)
