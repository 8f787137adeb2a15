"""Custom stateful streaming (applyInPandasWithState) and grouped-map
(applyInPandas) operators, cross-validated against batch equivalents."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from quack_reduce_spark.inventory._util import load, rnd
from quack_reduce_spark.operators.grouped import event_transitions
from quack_reduce_spark.streaming import read_event_stream
from quack_reduce_spark.streaming.stateful import running_user_stats


@pytest.fixture(scope="module")
def event_files(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stateful"))
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.mode("overwrite").parquet(d)
    return d, events


def test_stateful_accumulator_matches_batch(spark, event_files):
    path, batch_events = event_files
    stream = read_event_stream(spark, path, batch_events.schema, max_files_per_trigger=2)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per user per micro-batch: the LAST row
    # per user is the final accumulated state
    final = (
        spark.table("user_stats")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("tv"))
    )
    got = {r["user_id"]: (r["n_events"], round(r["tv"], 4)) for r in final.collect()}
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 4))
        for r in batch_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == want and len(got) > 10


def test_event_transitions_matches_window_equivalent(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    got = {
        (r["user_id"], r["from_type"], r["to_type"]): r["n"]
        for r in event_transitions(events).collect()
    }
    # window-lag equivalent (the SQL-expressible oracle)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    want = {
        (r["user_id"], r["from_type"], r["to_type"]): r["n"]
        for r in events.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("user_id", "from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 100


def test_transform_with_state_anomalies_match_batch(spark, event_files):
    # transformWithStateInPandas (Spark 4 API): streaming per-user
    # Welford mean + anomaly flags must equal a batch recomputation.
    # The state-server protocol is protobuf-encoded — skip where absent.
    pytest.importorskip("google.protobuf")

    from quack_reduce_spark.streaming.transform_state import (
        ANOMALY_FACTOR,
        flag_anomalies,
    )

    path, batch_events = event_files
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, path, batch_events.schema, max_files_per_trigger=100)
        q = (
            flag_anomalies(stream)
            .writeStream.format("memory")
            .queryName("anomaly_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table("anomaly_stream").toPandas()

        # batch oracle: same Welford pass per user in ts order
        pdf = batch_events.select("user_id", "ts", "value").toPandas()
        n_anom = 0
        for _, grp in pdf.sort_values("ts").groupby("user_id"):
            n, mean = 0, 0.0
            for v in grp["value"]:
                if n > 0 and float(v) > ANOMALY_FACTOR * mean:
                    n_anom += 1
                n += 1
                mean += (float(v) - mean) / n
        assert len(got) == len(pdf)  # every event emitted exactly once
        assert int(got["is_anomaly"].sum()) == n_anom
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
