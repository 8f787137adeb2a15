"""As-of join composite: handcrafted cases pin the exact semantics."""

from __future__ import annotations

import datetime as dt

from quack_reduce_spark.operators.asof import asof_join

TS = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, TS("2024-01-01T10:00"), "l1"), (1, TS("2024-01-01T12:00"), "l2"),
         (2, TS("2024-01-01T09:00"), "l3")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, TS("2024-01-01T09:30"), 10.0), (1, TS("2024-01-01T11:00"), 20.0),
         (2, TS("2024-01-01T09:30"), 30.0)],
        "k int, ts timestamp, v double",
    )
    out = {
        r["tag"]: r["v_asof"]
        for r in asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }
    assert out == {"l1": 10.0, "l2": 20.0, "l3": None}


def test_asof_exact_ts_matches(spark):
    # a right row AT the left timestamp must match (<= semantics)
    left = spark.createDataFrame([(1, TS("2024-01-01T10:00"))], "k int, ts timestamp")
    right = spark.createDataFrame([(1, TS("2024-01-01T10:00"), 7.0)], "k int, ts timestamp, v double")
    [row] = asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    assert row["v_asof"] == 7.0


def test_asof_no_right_rows_for_key(spark):
    left = spark.createDataFrame([(9, TS("2024-01-01T10:00"))], "k int, ts timestamp")
    right = spark.createDataFrame([(1, TS("2024-01-01T09:00"), 1.0)], "k int, ts timestamp, v double")
    [row] = asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    assert row["v_asof"] is None


def test_asof_forward(spark):
    left = spark.createDataFrame(
        [(1, TS("2024-01-01T10:00"), "l1"), (1, TS("2024-01-01T12:00"), "l2"),
         (2, TS("2024-01-01T09:00"), "l3")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, TS("2024-01-01T10:30"), 10.0), (1, TS("2024-01-01T11:00"), 20.0),
         (2, TS("2024-01-01T08:00"), 30.0)],
        "k int, ts timestamp, v double",
    )
    out = {
        r["tag"]: r["v_asof"]
        for r in asof_join(left, right, ["k"], "ts", "ts", ["v"], direction="forward").collect()
    }
    # l1 -> earliest at-or-after (10:30); l2 -> none after; l3 -> none after
    assert out == {"l1": 10.0, "l2": None, "l3": None}


def test_asof_forward_exact_ts_matches(spark):
    left = spark.createDataFrame([(1, TS("2024-01-01T10:00"))], "k int, ts timestamp")
    right = spark.createDataFrame([(1, TS("2024-01-01T10:00"), 7.0)], "k int, ts timestamp, v double")
    [row] = asof_join(left, right, ["k"], "ts", "ts", ["v"], direction="forward").collect()
    assert row["v_asof"] == 7.0


def test_asof_broadcast_matches_windowed(spark, sf_dir):
    # the broadcast small-right plan must produce exactly the windowed
    # composite's result on the fixture, both directions
    import pyspark.sql.functions as F

    from quack_reduce_spark.inventory._util import load
    from quack_reduce_spark.operators.asof import asof_join_broadcast

    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
    )
    for direction in ("backward", "forward"):
        a = asof_join(clicks, purchases, ["user_id"], "ts", "ts", ["v"],
                      direction=direction)
        b = asof_join_broadcast(clicks, purchases, ["user_id"], "ts", "ts",
                                ["v"], direction=direction)
        got = sorted((r["event_id"], r["v_asof"]) for r in b.collect())
        want = sorted((r["event_id"], r["v_asof"]) for r in a.collect())
        assert got == want and len(got) > 100


def test_asof_broadcast_plan_no_fact_shuffle(spark):
    # the whole point: fact side is Scan -> BroadcastHashJoin -> Project.
    # No Window, no Sort, and the ONLY exchanges are the packed right
    # side's aggregate + broadcast (never a hashpartitioning of the fact)
    import pyspark.sql.functions as F

    from quack_reduce_spark.operators.asof import asof_join_broadcast

    left = spark.range(0, 10000).select(
        (F.col("id") % 50).alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.col("id").alias("rowid"),
    )
    right = spark.range(0, 200).select(
        (F.col("id") % 50).alias("k"),
        F.timestamp_micros(F.col("id") * 37_000_000).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    out = asof_join_broadcast(left, right, ["k"], "ts", "ts", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    import re

    # any hash-exchange must be on the packed right side (key k), and
    # none may redistribute the 3-column fact
    fact_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "rowid" in ln
    ]
    assert fact_exchanges == []
    assert re.search(r"Exchange .*SinglePartition|BroadcastExchange", plan)


def test_asof_auto_routes_small_right_to_broadcast_plan(spark):
    from quack_reduce_spark.operators.asof import asof_join_auto
    from quack_reduce_spark.plans import formatted_plan

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20)], "id long, k string, ts long"
    )
    right = spark.createDataFrame([("a", 5, 1.0)], "k string, ts long, v double")
    out = asof_join_auto(left, right, ["k"], "ts", "ts", ["v"])
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan and "Window" not in plan
    assert {(r["id"], r["v_asof"]) for r in out.collect()} == {(1, 1.0), (2, 1.0)}


def test_asof_auto_routes_large_right_to_windowed_composite(spark):
    from quack_reduce_spark.operators.asof import asof_join, asof_join_auto
    from quack_reduce_spark.plans import formatted_plan

    left = spark.createDataFrame(
        [(i, "k", i * 10) for i in range(5)], "id long, k string, ts long"
    )
    right = spark.createDataFrame(
        [("k", i * 7, float(i)) for i in range(5)], "k string, ts long, v double"
    )
    # force the big-right route with a tiny threshold
    out = asof_join_auto(left, right, ["k"], "ts", "ts", ["v"], broadcast_row_limit=2)
    assert "Window" in formatted_plan(out)
    want = sorted(map(tuple, asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()))
    assert sorted(map(tuple, out.collect())) == want
