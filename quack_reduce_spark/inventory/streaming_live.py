"""Live Structured Streaming inventory — real ``readStream`` executions
surfaced through the driver's differential gate.

The reference has NO streaming surface (SURVEY §2 Tier C verified
absence); this module is north-star coverage, and unlike the batch
``ts_*`` twins it actually drives the streaming engine: each query
rewrites the events fixture as a multi-file µs-timestamp directory,
runs a file-source stream over it with Trigger.AvailableNow into a
memory sink, and returns the drained result table. On bounded input the
streaming result is exactly the batch result (complete output mode
keeps all window state; dedup emits first arrivals), so these have
REAL DuckDB SQL oracles — streaming correctness goes through the same
hash-match gate as every relational operator instead of a weaker
rows-only check.

Scale: file-source streams parallelize by file split like any scan;
window/dedup state is keyed (window or event_id) and partitioned by
the state-store; with RocksDB state backend this is the standard
continuous-ingest shape at 100 TB/day. AvailableNow here is the
bounded-backfill deployment mode (the same job, pointed at a live
directory, runs continuously).

Column-name parity: every aggregate is aliased identically in the
streaming DataFrame and the oracle SQL (driver hashes sort columns by
name).
"""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.streaming import (
    click_purchase_interval_join,
    dedup_within_watermark,
    enrich_with_static,
    read_event_stream,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

_CACHE_ROOT = "/tmp/quack_reduce_spark_streams"
_MATERIALIZED: set[str] = set()


def _event_stream_dir(spark: SparkSession, sf_dir: str, with_redeliveries: bool) -> str:
    """Materialize the events fixture as a 4-file µs-timestamp parquet
    dir (streaming file sources can't read the fixture's
    TIMESTAMP(NANOS) directly, and multiple files exercise multiple
    stream triggers). ``with_redeliveries`` appends a deterministic
    copy of every 10th event — the at-least-once-delivery corpus the
    dedup stream must collapse. The write is once per (process, path):
    the fixture is immutable, so repeated registry calls (four stream
    queries share two corpora) reuse the first materialization."""
    tag = "redelivered" if with_redeliveries else "plain"
    out = os.path.join(_CACHE_ROOT, os.path.basename(os.path.normpath(sf_dir)), tag)
    if out in _MATERIALIZED:
        return out
    events = load(spark, sf_dir, "events")
    # withWatermark demands TIMESTAMP (LTZ) event time; fixtures written
    # as parquet timestamp[us] surface as TIMESTAMP_NTZ. Session tz is
    # UTC, so the cast is wall-clock-preserving and the DuckDB oracle
    # (naive µs timestamps) sees identical instants.
    for f in events.schema.fields:
        if f.dataType.typeName() == "timestamp_ntz":
            events = events.withColumn(f.name, F.col(f.name).cast("timestamp"))
    if with_redeliveries:
        events = events.unionByName(events.filter(F.col("event_id") % 10 == 0))
    events.repartition(4).write.mode("overwrite").parquet(out)
    _MATERIALIZED.add(out)
    return out


def _stream_source(spark: SparkSession, sf_dir: str, with_redeliveries: bool) -> DataFrame:
    """Materialize (once) and open the event stream with the schema of
    the MATERIALIZED files — not the raw fixture's — so event-time
    columns are guaranteed watermark-compatible regardless of how the
    fixture was written."""
    path = _event_stream_dir(spark, sf_dir, with_redeliveries)
    schema = spark.read.parquet(path).schema
    return read_event_stream(spark, path, schema, max_files_per_trigger=2)


def _drain(df: DataFrame, spark: SparkSession, mode: str) -> DataFrame:
    name = f"qrs_stream_{uuid.uuid4().hex[:12]}"
    run_stream_to_memory(df, name, mode=mode)
    return spark.table(name)


def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour watermarked window counts computed BY THE
    STREAMING ENGINE (availableNow over a 4-file source, complete
    mode), equal to the batch/oracle result on bounded input."""
    stream = _stream_source(spark, sf_dir, with_redeliveries=False)
    return _drain(tumbling_counts(stream), spark, mode="complete")


def stream_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-minute-gap session windows computed by the streaming
    engine (stateful session_window merge across triggers)."""
    stream = _stream_source(spark, sf_dir, with_redeliveries=False)
    return _drain(session_counts(stream), spark, mode="complete")


def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour/30-minute watermarked window counts computed by
    the streaming engine — each event contributes to two overlapping
    windows' state across triggers."""
    stream = _stream_source(spark, sf_dir, with_redeliveries=False)
    return _drain(sliding_counts(stream), spark, mode="complete")


def stream_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows computed BY THE STREAMING ENGINE:
    purchases close their session after 2 idle minutes, other events
    after 5 (per-event CalendarInterval gap — stateful interval-union
    merge across triggers). Same oracle as the batch twin
    ts_session_dynamic_gap: on bounded input stream == batch."""
    stream = _stream_source(spark, sf_dir, with_redeliveries=False)
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("2 minutes")
    ).otherwise(F.lit("5 minutes"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return _drain(agg, spark, mode="complete")


def stream_dedup_redelivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming first-arrival dedup over an at-least-once corpus
    (every 10th event re-delivered in a later file):
    dropDuplicatesWithinWatermark collapses the stream back to exactly
    the distinct events. Returns per-type counts of surviving rows so
    the result is order-free and oracle-hashable."""
    stream = _stream_source(spark, sf_dir, with_redeliveries=True)
    deduped = dedup_within_watermark(stream, keys=["event_id"])
    drained = _drain(deduped, spark, mode="append")
    return drained.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.count_distinct("event_id").alias("n_distinct_ids"),
    )


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join run by the streaming engine: clicks and
    purchases as two watermarked streams over the same multi-file
    source, joined on user + 30-minute event-time interval; the range
    condition bounds the join state. Counts per user keep the result
    order-free for the hash gate."""
    clicks = _stream_source(spark, sf_dir, with_redeliveries=False).filter(
        F.col("event_type") == "click"
    )
    purchases = _stream_source(spark, sf_dir, with_redeliveries=False).filter(
        F.col("event_type") == "purchase"
    )
    joined = click_purchase_interval_join(clicks, purchases)
    drained = _drain(joined, spark, mode="append")
    return drained.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("click_id").alias("n_clicks_matched"),
    )


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join run by the streaming engine: the live event
    stream is enriched with a STATIC per-user profile (computed batch-
    side from the same fixture: events-per-user tier), then aggregated
    per (event_type, tier). The static side is broadcast per micro-
    batch — no state, no watermark. On bounded input this equals the
    batch join, so it has a real SQL oracle."""
    events = load(spark, sf_dir, "events")
    profiles = events.groupBy("user_id").agg(
        F.when(F.count(F.lit(1)) >= 15, F.lit("heavy"))
        .otherwise(F.lit("light"))
        .alias("tier")
    )
    stream = _stream_source(spark, sf_dir, with_redeliveries=False)
    enriched = enrich_with_static(stream, profiles).groupBy(
        "event_type", "tier"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return _drain(enriched, spark, mode="complete")


def stream_upsert_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE into a versioned lake table, run end to end BY
    THE STREAMING ENGINE: an update-mode per-user aggregation over the
    live event stream is drained through foreachBatch, each non-empty
    micro-batch committing one MERGE-upsert version (lake.py pointer
    protocol). The returned result is the LIVE TABLE after the stream
    finishes — per-user event counts and value sums — which on bounded
    input must equal the plain batch aggregate, so the whole
    stream→state→merge→commit→read pipeline is hash-ORACLED. History
    invariants (≥1 commit, ops are create-then-merge, monotone row
    counts) are asserted in-query; per-version contents are
    unit-tested in test_streaming.py.

    Hermetic: fresh scratch dirs per call, results collected eagerly,
    scratch removed before returning a local DataFrame."""
    import shutil

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.inventory._util import rnd
    from quack_reduce_spark.streaming import run_stream_merge_versioned

    scratch = os.path.join(
        _CACHE_ROOT, os.path.basename(os.path.normpath(sf_dir)),
        f"upsert_versioned_{uuid.uuid4().hex[:12]}",
    )
    table = os.path.join(scratch, "table")
    ckpt = os.path.join(scratch, "ckpt")
    stream = _stream_source(spark, sf_dir, with_redeliveries=False)
    per_user = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    run_stream_merge_versioned(per_user, table, key="user_id", checkpoint_dir=ckpt)

    eng = Engine(spark=spark)
    hist = eng.history(table)
    from quack_reduce_spark.inventory.lakeops import _require

    _require(bool(hist) and hist[0]["op"].startswith("stream_create"), "bad first commit", hist)
    _require(all(h["op"] == "merge_upsert" for h in hist[1:]), "non-merge commit in stream history", hist)
    _require(
        [h["rows"] for h in hist] == sorted(h["rows"] for h in hist),
        "per-user upsert stream must never shrink the table",
    )
    rows = [
        (int(r["user_id"]), int(r["n_events"]), float(r["sum_value"]))
        for r in eng.read_table(table)
        .select("user_id", "n_events", rnd(F.col("sum_value"), 2).alias("sum_value"))
        .collect()
    ]
    shutil.rmtree(scratch, ignore_errors=True)
    schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("n_events", LongType(), False),
            StructField("sum_value", DoubleType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARBITRARY-stateful streaming through the oracle gate: the
    applyInPandasWithState per-user accumulator
    (streaming/stateful.py — custom (n, Σvalue, last_ts) state, not a
    built-in window) runs live over the 4-file stream in update mode,
    emitting each user's running state once per micro-batch it appears
    in. The final emission per user (n_events is strictly increasing,
    so max_by on it is exact, not a heuristic) must equal the batch
    aggregate — which is the DuckDB oracle. This closes the gap between
    'the stateful operator has unit tests' and 'the stateful operator
    hash-matches SQL on real stream input'."""
    from quack_reduce_spark.inventory._util import rnd
    from quack_reduce_spark.streaming.stateful import running_user_stats

    stream = _stream_source(spark, sf_dir, with_redeliveries=False).select(
        "user_id", "ts", "value"
    )
    drained = _drain(running_user_stats(stream), spark, mode="update")
    return (
        drained.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("tv"),
            F.max_by("last_ts", "n_events").alias("last_ts"),
        )
        .select(
            "user_id",
            "n_events",
            rnd(F.col("tv"), 4).alias("total_value"),
            "last_ts",
        )
    )


def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join run by the streaming
    engine: unmatched clicks must surface with NULL purchase columns
    once the watermark passes their interval — the semantics (and the
    state-eviction behavior behind them) that an inner join never
    exercises. A streaming left-outer only EMITS an unmatched click
    once the watermark passes its join interval, so clicks near the
    bounded input's end never get their NULL row (state drains, the
    stream ends) — both sides of the differential therefore compare
    only clicks ≥ 6 h clear of the emission frontier, the same
    contract tests/test_streaming.py pins for this operator. Per-user
    matched/unmatched counts keep the hash order-free."""
    clicks = _stream_source(spark, sf_dir, with_redeliveries=False).filter(
        F.col("event_type") == "click"
    )
    purchases = _stream_source(spark, sf_dir, with_redeliveries=False).filter(
        F.col("event_type") == "purchase"
    )
    joined = click_purchase_interval_join(clicks, purchases, how="leftOuter")
    drained = _drain(joined, spark, mode="append")
    max_ts = load(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    return (
        drained.filter(
            F.col("click_ts") <= F.lit(max_ts) - F.expr("INTERVAL 6 HOURS")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("purchase_ts").isNull()).alias("n_unmatched"),
            F.count_distinct("click_id").alias("n_clicks"),
        )
    )


def stream_hll_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user (DAU) ESTIMATES computed BY THE STREAMING
    ENGINE: the portable-HLL registers are the streaming state —
    max(rho) per (1-day window, register idx) aggregates incrementally
    across the 4-file stream's triggers, FIXED-WIDTH per window (256
    registers) no matter the event rate, which is exactly why HLL is
    the streaming DAU structure in production. The drained register
    table (a few hundred rows) is folded through the same estimator as
    the batch twin sketch_hll_windowed; bounded input == batch, so
    each day's ESTIMATE hash-matches the DuckDB register replay."""
    from quack_reduce_spark.inventory.sketches import _hll_est_col
    from quack_reduce_spark.operators.sketches import (
        HLL_M,
        HLL_W_BITS,
        hll_rho,
        md5_h32,
    )

    stream = _stream_source(spark, sf_dir, with_redeliveries=False)
    h = md5_h32(F.col("user_id").cast("string"))
    prepared = stream.select(
        "ts",
        F.shiftrightunsigned(h, HLL_W_BITS).alias("idx"),
        hll_rho(h.bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))).alias("rho"),
    )
    regs = (
        prepared.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("idx"))
        .agg(F.max("rho").alias("M"))
    )
    drained = _drain(regs, spark, mode="complete")
    sums = drained.groupBy(F.col("w.start").alias("day")).agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("present_sum"),
    )
    exact = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    est = _hll_est_col()
    from quack_reduce_spark.inventory._util import rnd

    return (
        sums.join(exact, "day")
        .select(
            "day",
            F.col("nonzero").alias("regs_nonzero"),
            rnd(est, 4).alias("est_users"),
            "exact_users",
            rnd(F.abs(est - F.col("exact_users")) / F.col("exact_users"), 4).alias(
                "rel_err"
            ),
        )
        .orderBy("day")
    )


def stream_hll_dau_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION output mode for the streaming DAU sketch:
    stream_hll_dau drains in COMPLETE mode, re-emitting every window's
    registers each trigger and never exercising state EVICTION — at
    scale the register table must FINALIZE each day as the watermark
    passes its end and then drop that day's state. This twin runs the
    identical register aggregation in APPEND mode: a (window, idx) row
    reaches the sink exactly once, when the 1-hour watermark passes the
    window end, and the state store forgets it. On bounded input only
    days whose end the final watermark passed are emitted, so both
    sides of the differential compare days >= 6 h clear of the
    emission frontier — the same contract stream_interval_join_left
    pins (and with a 1 h watermark, any day inside the 6 h margin has
    PROVABLY been finalized: day_end <= max_ts - 6h < max_ts - 1h =
    final watermark). Late-data register semantics (pre-eviction
    update accepted, post-eviction drop) are pinned in
    tests/test_streaming.py::test_hll_append_late_events."""
    from quack_reduce_spark.inventory._util import rnd
    from quack_reduce_spark.inventory.sketches import _hll_est_col
    from quack_reduce_spark.operators.sketches import (
        HLL_W_BITS,
        hll_rho,
        md5_h32,
    )

    stream = _stream_source(spark, sf_dir, with_redeliveries=False)
    h = md5_h32(F.col("user_id").cast("string"))
    prepared = stream.select(
        "ts",
        F.shiftrightunsigned(h, HLL_W_BITS).alias("idx"),
        hll_rho(h.bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))).alias("rho"),
    )
    regs = (
        prepared.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("idx"))
        .agg(F.max("rho").alias("M"))
    )
    drained = _drain(regs, spark, mode="append")
    max_ts = load(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    finalized = drained.filter(
        F.col("w.end") <= F.lit(max_ts) - F.expr("INTERVAL 6 HOURS")
    )
    sums = finalized.groupBy(F.col("w.start").alias("day")).agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("present_sum"),
    )
    exact = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    est = _hll_est_col()
    return (
        sums.join(exact, "day")
        .select(
            "day",
            F.col("nonzero").alias("regs_nonzero"),
            rnd(est, 4).alias("est_users"),
            "exact_users",
            rnd(F.abs(est - F.col("exact_users")) / F.col("exact_users"), 4).alias(
                "rel_err"
            ),
        )
        .orderBy("day")
    )


def stream_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters with the COUNTERS AS STREAMING STATE —
    the additive twin of stream_hll_dau's max-merge registers: each
    event increments its 4 salted-md5 buckets, the streaming engine's
    state is the 4x256 counter table (fixed-width regardless of event
    rate — count-min's whole point as a streaming structure), and
    partial counts merge by cell-wise SUM across the 4-file stream's
    triggers. The drained 1024-row counter table is probed per user
    (min over the 4 rows) exactly like the batch twin
    sketch_cms_heavy_hitters; bounded input == batch, so the top-10
    most-active-user ESTIMATES hash-match the DuckDB counter replay,
    with the exact count and the provably non-negative overcount
    alongside."""
    from quack_reduce_spark.inventory.sketches import CMS_ROWS, CMS_TOP, CMS_WIDTH
    from quack_reduce_spark.operators.sketches import cms_buckets

    stream = _stream_source(spark, sf_dir, with_redeliveries=False)
    prepared = stream.select(
        F.posexplode(
            cms_buckets(F.col("user_id").cast("string"), CMS_ROWS, CMS_WIDTH)
        ).alias("r", "bucket")
    )
    counters = prepared.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    drained = _drain(counters, spark, mode="complete")

    per_key = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_events"))
    )
    probes = per_key.select(
        "user_id",
        "exact_events",
        F.posexplode(
            cms_buckets(F.col("user_id").cast("string"), CMS_ROWS, CMS_WIDTH)
        ).alias("r", "bucket"),
    )
    return (
        probes.join(drained, ["r", "bucket"])
        .groupBy("user_id", "exact_events")
        .agg(F.min("cnt").alias("est_events"))
        .select(
            "user_id",
            "est_events",
            "exact_events",
            (F.col("est_events") - F.col("exact_events")).alias("overcount"),
        )
        .orderBy(F.col("est_events").desc(), F.col("user_id").asc())
        .limit(CMS_TOP)
    )


QUERIES = {
    "stream_stateful_user_stats": stream_stateful_user_stats,
    "stream_cms_topk": stream_cms_topk,
    "stream_interval_join_left": stream_interval_join_left,
    "stream_tumbling_agg": stream_tumbling_agg,
    "stream_hll_dau": stream_hll_dau,
    "stream_hll_dau_append": stream_hll_dau_append,
    "stream_upsert_versioned": stream_upsert_versioned,
    "stream_static_enrich": stream_static_enrich,
    "stream_session_dynamic": stream_session_dynamic,
    "stream_interval_join": stream_interval_join,
    "stream_session_agg": stream_session_agg,
    "stream_sliding_agg": stream_sliding_agg,
    "stream_dedup_redelivery": stream_dedup_redelivery,
}

# session_counts emits n_events only (no sum_value) — see streaming/
# __init__.py; oracle mirrors the batch ts_session_window gaps-and-
# islands construction minus the value sum.
ORACLES = {
    "stream_stateful_user_stats": """
        -- bounded-input equivalence for the custom stateful operator:
        -- final per-user state == batch aggregate
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               FLOOR(SUM(value) * 1e4 + 0.5) / 1e4 AS total_value,
               MAX(ts) AS last_ts
        FROM events GROUP BY user_id
    """,
    "stream_upsert_versioned": """
        -- bounded-input equivalence: the live versioned table after
        -- the streaming MERGE drain is exactly the batch aggregate
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               FLOOR(SUM(value) * 1e2 + 0.5) / 1e2 AS sum_value
        FROM events GROUP BY user_id
    """,
    "stream_tumbling_agg": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               COUNT(*) AS n_events,
               FLOOR((SUM(value)) * 1e4 + 0.5) / 1e4 AS sum_value
        FROM events GROUP BY 1
    """,
    "stream_session_agg": """
        WITH d AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '5 minutes'
                        THEN 1 ELSE 0 END AS brk
            FROM events
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM d
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    "stream_interval_join": """
        WITH c AS (
            SELECT event_id AS click_id, user_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id AS p_user, ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        ),
        j AS (
            SELECT c.click_id, c.user_id
            FROM c JOIN p
              ON c.user_id = p.p_user
             AND p.purchase_ts >= c.click_ts
             AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
        )
        SELECT user_id, COUNT(*) AS n_pairs,
               COUNT(DISTINCT click_id) AS n_clicks_matched
        FROM j GROUP BY user_id
    """,
    "stream_interval_join_left": """
        WITH c AS (
            SELECT event_id AS click_id, user_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id AS p_user, ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        ),
        j AS (
            SELECT c.click_id, c.user_id, p.purchase_ts
            FROM c LEFT JOIN p
              ON c.user_id = p.p_user
             AND p.purchase_ts >= c.click_ts
             AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
            WHERE c.click_ts <= (SELECT MAX(ts) FROM events)
                                - INTERVAL '6 hours'
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (purchase_ts IS NULL) AS BIGINT)
                   AS n_unmatched,
               COUNT(DISTINCT click_id) AS n_clicks
        FROM j GROUP BY user_id
    """,
    "stream_sliding_agg": """
        WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b0 FROM events),
        expanded AS (
            SELECT b0 AS ws FROM b
            UNION ALL
            SELECT b0 - INTERVAL '30 minutes' AS ws FROM b
        )
        SELECT ws AS window_start, COUNT(*) AS n_events
        FROM expanded GROUP BY 1
    """,
    "stream_dedup_redelivery": """
        SELECT event_type,
               COUNT(*) AS n_unique,
               COUNT(DISTINCT event_id) AS n_distinct_ids
        FROM events GROUP BY event_type
    """,
    "stream_session_dynamic": """
        WITH d AS (
            SELECT user_id, ts,
                   CASE WHEN event_type = 'purchase'
                        THEN INTERVAL '2 minutes' ELSE INTERVAL '5 minutes'
                   END AS gap
            FROM events
        ),
        x AS (
            SELECT user_id, ts, gap,
                   MAX(ts + gap) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS horizon
            FROM d
        ),
        s AS (
            SELECT user_id, ts, gap,
                   SUM(CASE WHEN horizon IS NULL OR ts >= horizon
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sid
            FROM x
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts + gap) AS session_end,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    "stream_static_enrich": """
        WITH profiles AS (
            SELECT user_id,
                   CASE WHEN COUNT(*) >= 15 THEN 'heavy' ELSE 'light' END AS tier
            FROM events GROUP BY user_id
        )
        SELECT e.event_type, p.tier, COUNT(*) AS n_events
        FROM events e LEFT JOIN profiles p USING (user_id)
        GROUP BY e.event_type, p.tier
    """,
}


def _stream_hll_dau_oracle() -> str:
    # identical register replay as the batch twin sketch_hll_windowed:
    # day windows are epoch-aligned (UTC), so window('1 day').start ==
    # date_trunc('day', ts)
    from quack_reduce_spark.inventory.sketches import _hll_windowed_oracle

    return _hll_windowed_oracle()


ORACLES["stream_hll_dau"] = _stream_hll_dau_oracle()


def _stream_hll_dau_append_oracle() -> str:
    # the batch register replay restricted to FINALIZED days — the
    # same 6 h emission-frontier contract the Spark side filters on
    # (day end <= max(ts) - 6 h, which with the 1 h watermark implies
    # the append-mode sink has provably received the day)
    base = _stream_hll_dau_oracle()
    return base.replace(
        "FROM sums s JOIN exact e USING (day)",
        "FROM sums s JOIN exact e USING (day)\n"
        "        WHERE s.day + INTERVAL '1 day' <= "
        "(SELECT MAX(ts) FROM events) - INTERVAL '6 hours'",
    )


ORACLES["stream_hll_dau_append"] = _stream_hll_dau_append_oracle()


def _stream_cms_topk_oracle() -> str:
    # replay of the streamed counter table from the raw fixture: the
    # streaming state is an additive cell-wise sum, so on bounded
    # input it equals hashing every raw event row
    from quack_reduce_spark.inventory.sketches import CMS_ROWS, CMS_TOP, CMS_WIDTH
    from quack_reduce_spark.operators.sketches import cms_bucket_sql

    key = "CAST(user_id AS VARCHAR)"
    rows = "\n            UNION ALL ".join(
        f"SELECT user_id, {r} AS r, {cms_bucket_sql(key, r, CMS_WIDTH)} AS bucket FROM events"
        for r in range(CMS_ROWS)
    )
    return f"""
        WITH keyed AS (
            {rows}
        ),
        counters AS (
            SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM keyed GROUP BY r, bucket
        ),
        probes AS (
            SELECT DISTINCT user_id, r, bucket FROM keyed
        ),
        est AS (
            SELECT p.user_id, MIN(c.cnt) AS est_events
            FROM probes p JOIN counters c USING (r, bucket)
            GROUP BY p.user_id
        ),
        exact AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_events
            FROM events GROUP BY user_id
        )
        SELECT e.user_id, e.est_events, x.exact_events,
               e.est_events - x.exact_events AS overcount
        FROM est e JOIN exact x USING (user_id)
        ORDER BY e.est_events DESC, e.user_id ASC
        LIMIT {CMS_TOP}
    """


ORACLES["stream_cms_topk"] = _stream_cms_topk_oracle()
