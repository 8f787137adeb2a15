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
