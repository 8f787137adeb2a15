"""Continuous event pipeline — the deployment shape of the streaming
surface (SURVEY §2 Tier C north-star; the reference has no streaming).

Shape: events parquet directory (stand-in for a live landing zone)
  → file-source readStream (explicit schema, admission-controlled via
    maxFilesPerTrigger)
  → dropDuplicatesWithinWatermark on event_id (at-least-once delivery
    collapsed with bounded state)
  → watermarked tumbling window aggregate
  → parquet sink with checkpoint (exactly-once file sink)

Run with Trigger.AvailableNow it is a bounded backfill; pointed at a
directory that keeps receiving files, the SAME job runs continuously —
that duality is the deployment story at scale.

Run:  python examples/streaming_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from quack_reduce_spark.functions.numeric import rnd
from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.session import get_spark
from quack_reduce_spark.streaming import read_event_stream


def run(sf_dir: str, out_dir: str) -> int:
    spark = get_spark("streaming-pipeline")

    # landing zone: µs-timestamp multi-file copy of the fixture events
    landing = f"{out_dir}/landing"
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.mode("overwrite").parquet(landing)

    # read_event_stream normalizes NTZ event time to watermark-
    # compatible TIMESTAMP; maxFilesPerTrigger=2 is admission control
    stream = read_event_stream(spark, landing, events.schema, max_files_per_trigger=2)
    hourly = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), rnd(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
    )

    sink = f"{out_dir}/hourly_rollup"
    query = (
        hourly.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    # append-mode windows finalize when the watermark passes; on a
    # bounded backfill the last open hour stays pending until the next
    # batch of files arrives — exactly the continuous-job semantics
    result = spark.read.parquet(sink)
    n = result.count()
    print(f"hourly rollup rows written: {n}")
    result.orderBy(F.col("n").desc()).show(5, truncate=False)
    return n


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="qrs_stream_pipe_")
    run(sf, out)
