"""Plan-shape assertions (SURVEY §4): prove the optimizations the
reference hand-rolled are active as Catalyst built-ins — pushdown,
partition pruning, broadcast joins, partial/final aggregation, top-k.
These are the 100 TB design checks: a plan that scans all columns or
shuffles a fact table for a dim join is wrong regardless of test-scale
timing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from quack_reduce_spark import plans
from quack_reduce_spark.inventory import relational
from quack_reduce_spark.inventory._util import load


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    # reference O5: predicate pushdown (delegated to DuckDB there)
    df = relational.a04_filter_range(spark, sf_dir)
    assert plans.has_pushed_filter(df, "l_shipdate")


def test_column_pruning(spark, sf_dir):
    # a 3-column projection must not read the other 8 lineitem columns
    df = relational.a01_scan_project(spark, sf_dir)
    cols = plans.read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_quantity"}


def test_star_join_broadcasts_dims(spark, sf_dir):
    # the fact table must never shuffle for dim lookups
    df = relational.b_join_star_broadcast(spark, sf_dir)
    assert plans.has_broadcast_join(df)


def test_group_count_is_partial_final(spark, sf_dir):
    # reference A10/O2: the manual map-reduce is Spark's default plan
    df = relational.a06_group_count(spark, sf_dir)
    assert plans.has_partial_final_agg(df)


def test_topk_uses_take_ordered(spark, sf_dir):
    # sort+limit must fuse into TakeOrderedAndProject (no full sort)
    df = relational.a09_topk(spark, sf_dir)
    assert plans.has_top_k(df)


def test_partition_pruning_on_hive_layout(spark, sf_dir, tmp_path):
    # reference O1: manual date=... path construction -> automatic here
    li = load(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.month("l_shipdate")
    )
    li.write.partitionBy("ship_month").mode("overwrite").parquet(str(tmp_path / "p"))
    back = spark.read.parquet(str(tmp_path / "p"))
    pruned = back.filter(F.col("ship_month") == 3)
    plan = plans.formatted_plan(pruned)
    # partition filters appear as PartitionFilters, not data filters
    assert "PartitionFilters" in plan and "ship_month" in plan
    assert pruned.count() > 0


def test_limit_is_pushed_not_post_truncated(spark, sf_dir):
    # reference O4: app.py computes the FULL query then truncates; our
    # engine pushes the limit into the plan (CollectLimit / TakeOrdered)
    df = load(spark, sf_dir, "lineitem").select("l_orderkey").limit(5)
    plan = plans.executed_plan(df)
    assert "CollectLimit" in plan or "GlobalLimit" in plan


def test_tpch_q14_broadcasts_part(spark, sf_dir):
    # dim side (part) under the threshold must broadcast — shuffling
    # the lineitem fact for a dim lookup would be wrong at any scale
    from quack_reduce_spark.inventory import tpch

    assert plans.has_broadcast_join(tpch.tpch_q14_promo_revenue(spark, sf_dir))


def test_tpch_q18_topk_is_take_ordered(spark, sf_dir):
    # ORDER BY + LIMIT 20 must plan as TakeOrderedAndProject, never a
    # full global sort followed by a limit
    from quack_reduce_spark.inventory import tpch

    df = tpch.tpch_q18_large_volume_customers(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_tpch_q6_pushdown_and_no_shuffle_before_agg(spark, sf_dir):
    # Q6 is scan + filter + global agg: predicates reach the parquet
    # reader and the only exchange is the single-row final agg's
    from quack_reduce_spark.inventory import tpch

    df = tpch.tpch_q6_forecast_revenue(spark, sf_dir)
    assert plans.has_pushed_filter(df, "l_shipdate")
    assert plans.has_partial_final_agg(df)


def test_q4_semi_join_plan(spark, sf_dir):
    # EXISTS must plan as a (left) semi join, not an inner join + distinct
    from quack_reduce_spark.inventory import tpch

    plan = plans.formatted_plan(tpch.tpch_q4_order_priority(spark, sf_dir))
    assert "LeftSemi" in plan


def test_window_qualify_uses_group_limit(spark, sf_dir):
    # the QUALIFY pattern must plan as WindowGroupLimit (per-partition
    # top-k before the rank materializes), not a full-rank-then-filter
    from quack_reduce_spark.inventory import relational4

    plan = plans.formatted_plan(relational4.b3_window_qualify(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_shingle_table_is_shuffle_free(spark, sf_dir):
    # shingle assembly must stay scan-shaped: no Exchange anywhere
    # before the explode (SCALE.md "chunking is scan-shaped" rule)
    from quack_reduce_spark.operators.dedup import _shingle_table

    docs = load(spark, sf_dir, "documents")
    sh = _shingle_table(docs, "text", "doc_id", 3, hashed=True, distinct=False)
    assert "Exchange" not in plans.formatted_plan(sh)
