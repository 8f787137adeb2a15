"""Structured Streaming: stream results must equal batch results on the
same input files (the only oracle available for streaming — the
reference has no streaming surface at all, SURVEY §2 Tier C)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.streaming import (
    read_event_stream,
    run_stream_to_memory,
    session_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def event_files(spark, sf_dir, tmp_path_factory):
    """Re-write fixture events as a 4-file directory (µs timestamps) so
    the file stream processes multiple triggers."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.mode("overwrite").parquet(d)
    return d, events


def test_tumbling_stream_equals_batch(spark, event_files):
    path, batch_events = event_files
    schema = batch_events.schema
    stream = read_event_stream(spark, path, schema, max_files_per_trigger=2)
    run_stream_to_memory(tumbling_counts(stream), "t_tumble", mode="complete")
    got = {
        (r["window_start"], r["n_events"], r["sum_value"])
        for r in spark.table("t_tumble").collect()
    }
    want = {
        (r["window_start"], r["n_events"], r["sum_value"])
        for r in tumbling_counts(batch_events).collect()
    }
    assert got == want and len(got) > 100


def test_session_stream_equals_batch(spark, event_files):
    path, batch_events = event_files
    stream = read_event_stream(spark, path, batch_events.schema, max_files_per_trigger=2)
    run_stream_to_memory(session_counts(stream), "t_sess", mode="complete")
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.table("t_sess").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_counts(batch_events).collect()
    }
    assert got == want and len(got) > 100


def test_watermark_present_in_stream_plan(spark, event_files):
    path, batch_events = event_files
    stream = read_event_stream(spark, path, batch_events.schema)
    agg = tumbling_counts(stream, watermark="30 minutes")
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()


def test_dedup_within_watermark_drops_redeliveries(spark, event_files):
    # duplicate every event id (simulated at-least-once redelivery with
    # a nudged timestamp); the streaming dedup must emit each id once.
    import pyspark.sql.functions as F

    from quack_reduce_spark.streaming import dedup_within_watermark

    path, batch_events = event_files
    dup_dir = path + "_dup"
    nudged = batch_events.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 SECOND")
    )
    batch_events.unionByName(nudged).repartition(4).write.mode("overwrite").parquet(dup_dir)

    stream = read_event_stream(spark, dup_dir, batch_events.schema, max_files_per_trigger=2)
    q = run_stream_to_memory(
        dedup_within_watermark(stream, ["event_id"], watermark="10 minutes"),
        "dedup_stream",
        mode="append",
    )
    try:
        got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_stream").collect()[0]
        total = batch_events.count()
        assert got["d"] == total
        assert got["n"] == total  # every id exactly once despite 2x input
    finally:
        q.stop()


def test_sliding_stream_equals_batch(spark, event_files):
    from quack_reduce_spark.streaming import sliding_counts

    path, batch_events = event_files
    stream = read_event_stream(spark, path, batch_events.schema, max_files_per_trigger=2)
    q = run_stream_to_memory(sliding_counts(stream), "sliding_stream")
    try:
        got = {
            (r["window_start"], r["n_events"])
            for r in spark.sql("SELECT * FROM sliding_stream").collect()
        }
        want = {
            (r["window_start"], r["n_events"])
            for r in sliding_counts(batch_events).collect()
        }
        assert got == want
    finally:
        q.stop()


def test_stream_registry_queries_match_batch(spark):
    # the live-streaming inventory entries must equal their batch twins
    # (same expressions, streaming engine) on the bounded fixture
    from quack_reduce_spark.inventory.streaming_live import (
        stream_dedup_redelivery,
        stream_tumbling_agg,
    )
    from quack_reduce_spark.inventory.timeseries import ts_tumbling_window

    sf = "/root/testdata/sf0.001"
    got = {
        (r["window_start"], r["n_events"], r["sum_value"])
        for r in stream_tumbling_agg(spark, sf).collect()
    }
    want = {
        (r["window_start"], r["n_events"], r["sum_value"])
        for r in ts_tumbling_window(spark, sf).collect()
    }
    assert got == want

    # redeliveries (10% of events duplicated in the stream) collapse
    dd = stream_dedup_redelivery(spark, sf)
    tot = sum(r["n_unique"] for r in dd.collect())
    n_events = load(spark, sf, "events").count()
    assert tot == n_events


def test_foreach_batch_upsert_log_matches_batch(spark, sf_dir, tmp_path):
    """foreachBatch update-mode sink: the latest-batch-per-window state
    of the appended upsert log must equal the batch aggregate over the
    same files."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from quack_reduce_spark.inventory._util import load
    from quack_reduce_spark.streaming import (
        read_event_stream,
        run_stream_foreach_batch,
        tumbling_counts,
    )

    src = str(tmp_path / "src")
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.parquet(src)

    stream = read_event_stream(spark, src, events.schema, max_files_per_trigger=2)
    out = str(tmp_path / "sink")
    run_stream_foreach_batch(
        tumbling_counts(stream), out, str(tmp_path / "ckpt")
    )

    log = spark.read.parquet(out)
    w = W.partitionBy("window_start").orderBy(F.col("__batch_id").desc())
    final = (
        log.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("window_start", "n_events", "sum_value")
    )
    batch = tumbling_counts(events)
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Two watermarked streams joined on user + event-time interval
    must produce exactly the batch join of the same files."""
    import pyspark.sql.functions as F

    from quack_reduce_spark.inventory._util import load
    from quack_reduce_spark.streaming import (
        click_purchase_interval_join,
        read_event_stream,
        run_stream_to_memory,
    )

    src = str(tmp_path / "src")
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.parquet(src)

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    s1 = read_event_stream(spark, src, events.schema, max_files_per_trigger=2)
    s2 = read_event_stream(spark, src, events.schema, max_files_per_trigger=2)
    joined_stream = click_purchase_interval_join(*[
        f(s) for f, s in zip(
            [lambda d: d.filter(F.col("event_type") == "click"),
             lambda d: d.filter(F.col("event_type") == "purchase")],
            [s1, s2],
        )
    ])
    import uuid

    name = f"ssj_{uuid.uuid4().hex[:10]}"
    run_stream_to_memory(joined_stream, name, mode="append")
    stream_rows = sorted(map(tuple, spark.table(name).collect()))

    batch_rows = sorted(
        map(tuple, click_purchase_interval_join(*split(events)).collect())
    )
    assert stream_rows == batch_rows and len(batch_rows) > 0


def test_stream_stream_left_outer_join_matches_batch(spark, sf_dir, tmp_path):
    """Left-outer stream-stream join: unmatched clicks must surface
    (with NULL purchase columns) exactly as in the batch left join once
    the bounded stream drains."""
    import uuid

    import pyspark.sql.functions as F

    from quack_reduce_spark.inventory._util import load
    from quack_reduce_spark.streaming import (
        click_purchase_interval_join,
        read_event_stream,
        run_stream_to_memory,
    )

    src = str(tmp_path / "src")
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.parquet(src)

    s1 = read_event_stream(spark, src, events.schema, max_files_per_trigger=2).filter(
        F.col("event_type") == "click"
    )
    s2 = read_event_stream(spark, src, events.schema, max_files_per_trigger=2).filter(
        F.col("event_type") == "purchase"
    )
    name = f"ssj_lo_{uuid.uuid4().hex[:10]}"
    run_stream_to_memory(
        click_purchase_interval_join(s1, s2, how="leftOuter"), name, mode="append"
    )
    stream_rows = sorted(
        map(tuple, spark.table(name).collect()), key=lambda t: tuple(map(str, t))
    )
    # streaming left-outer only EMITS an unmatched click once the
    # watermark passes its join interval; clicks near the end of the
    # bounded input never get their NULL row (state drains, stream
    # ends), and the exact emission frontier depends on when the final
    # no-data batch observed which per-source watermark. Compare well
    # clear of it: clicks more than 6h before the max event time.
    import datetime as dt

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(hours=6)
    batch = click_purchase_interval_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
        how="leftOuter",
    ).filter(F.col("click_ts") <= F.lit(cutoff))
    batch_rows = sorted(
        map(tuple, batch.collect()), key=lambda t: tuple(map(str, t))
    )
    stream_rows = [r for r in stream_rows if r[2] <= cutoff]
    assert stream_rows == batch_rows
    assert any(r[3] is None for r in batch_rows)  # unmatched clicks exist


def test_stream_static_enrich_matches_batch(spark):
    # a stream joined to a static broadcast dimension must equal the
    # batch join of the same files (no state, no watermark involved)
    from quack_reduce_spark.inventory.streaming_live import stream_static_enrich

    sf = "/root/testdata/sf0.001"
    import pyspark.sql.functions as F

    events = load(spark, sf, "events")
    profiles = events.groupBy("user_id").agg(
        F.when(F.count(F.lit(1)) >= 15, F.lit("heavy"))
        .otherwise(F.lit("light"))
        .alias("tier")
    )
    want = {
        (r["event_type"], r["tier"], r["n_events"])
        for r in events.join(profiles, "user_id", "left")
        .groupBy("event_type", "tier")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    got = {
        (r["event_type"], r["tier"], r["n_events"])
        for r in stream_static_enrich(spark, sf).collect()
    }
    assert got == want and len(got) > 0


def test_read_upsert_log_returns_latest_state(spark, sf_dir, tmp_path):
    # the CDC-merge reader over the foreachBatch upsert log must equal
    # the batch aggregate (latest batch per window wins)
    from quack_reduce_spark.streaming import (
        read_event_stream,
        read_upsert_log,
        run_stream_foreach_batch,
        tumbling_counts,
    )

    src = str(tmp_path / "src")
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.parquet(src)
    stream = read_event_stream(spark, src, events.schema, max_files_per_trigger=2)
    q = run_stream_foreach_batch(
        tumbling_counts(stream), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )

    state = read_upsert_log(spark, str(tmp_path / "sink"), keys=["window_start"])
    batch = tumbling_counts(events)
    assert sorted(map(tuple, state.select(*batch.columns).collect())) == sorted(
        map(tuple, batch.collect())
    )

    # progress summary exposes sane operational numbers
    from quack_reduce_spark.streaming import stream_progress_summary

    m = stream_progress_summary(q)
    assert m["n_batches"] >= 2  # maxFilesPerTrigger=2 over 4 files
    assert m["input_rows"] == events.count()
    assert m["truncated"] is False  # well under the ring-buffer cap


def test_read_upsert_log_deterministic_on_multi_row_batches(spark, tmp_path):
    # non-aggregated streams can write several rows per key per batch;
    # the survivor must be deterministic (greatest payload struct), not
    # scan-order luck
    from quack_reduce_spark.streaming import read_upsert_log

    log = spark.createDataFrame(
        [
            ("k1", "a", 7, 0),
            ("k1", "z", 3, 0),  # same key, same batch
            ("k2", "m", 1, 0),
        ],
        "k string, payload string, n int, __batch_id long",
    )
    log.write.parquet(str(tmp_path / "log"))
    for _ in range(3):
        got = {
            (r["k"], r["payload"], r["n"])
            for r in read_upsert_log(spark, str(tmp_path / "log"), keys=["k"]).collect()
        }
        # payload columns compare alphabetically (n before payload):
        # the n=7 row deterministically survives
        assert got == {("k1", "a", 7), ("k2", "m", 1)}


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    # three ordered files: on-time events, a small on-time follow-up
    # (commits the advanced watermark — Spark applies watermarks with a
    # one-batch lag), then a file of events six hours behind. The late
    # rows belong to windows behind the committed watermark and must be
    # dropped; only finalized on-time windows emit in append mode.
    import datetime as dt
    import glob
    import os
    import time
    import uuid

    from quack_reduce_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        tumbling_counts,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    on_time = [(i, base + dt.timedelta(minutes=i), 1, "click", 1.0, "{}") for i in range(120)]
    mid = [(500, base + dt.timedelta(minutes=121), 1, "click", 1.0, "{}")]
    late = [(1000 + i, base - dt.timedelta(hours=6), 2, "click", 1.0, "{}") for i in range(10)]
    src = str(tmp_path / "src")
    for i, batch in enumerate([on_time, mid, late]):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(src + f"/f={i}")
    # file source takes oldest mtime first; space them out explicitly
    now = time.time()
    for i in range(3):
        for f in glob.glob(src + f"/f={i}/*.parquet"):
            os.utime(f, (now - 600 + i * 200, now - 600 + i * 200))

    stream = read_event_stream(
        spark, src + "/f=*", spark.createDataFrame([], schema).schema,
        max_files_per_trigger=1,
    )
    name = f"late_{uuid.uuid4().hex[:10]}"
    run_stream_to_memory(
        tumbling_counts(stream, watermark="30 minutes"), name, mode="append"
    )
    got = {r["window_start"]: r["n_events"] for r in spark.table(name).collect()}
    late_window = (base - dt.timedelta(hours=6)).replace(minute=0)
    assert late_window not in got          # late rows dropped
    assert got.get(base) == 60             # finalized on-time window emitted


def test_hll_append_late_events(spark, tmp_path):
    """Append-mode windowed-HLL late-data contract (r9): a late event
    whose day-window is still OPEN under the committed watermark must
    UPDATE that day's registers; a late event whose window was already
    evicted must be DROPPED; and the frontier day (watermark never
    passes its end) must never emit. Mirrors the frontier contract of
    stream_interval_join_left / test_watermark_drops_late_rows."""
    import datetime as dt
    import glob
    import os
    import time
    import uuid

    from quack_reduce_spark.operators.sketches import (
        HLL_W_BITS,
        hll_registers,
        hll_rho,
        md5_h32,
    )
    from quack_reduce_spark.streaming import read_event_stream, run_stream_to_memory

    day = lambda d, h=0, m=0: dt.datetime(2024, 3, d, h, m, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    # batch 0: day1 users 1-3 + a day2 06:00 row (advances event time)
    f0 = [(i, day(1, 12), i, "click", 1.0, "{}") for i in (1, 2, 3)] + [
        (10, day(2, 6), 10, "click", 1.0, "{}")
    ]
    # batch 1: small follow-up that COMMITS the advanced watermark
    # (one-batch lag, same trick as test_watermark_drops_late_rows);
    # re-uses user 10 so no register set changes
    f1 = [(11, day(2, 6, 10), 10, "click", 1.0, "{}")]
    # batch 2: user 4 lands in day1 (window end day2 00:00 <= committed
    # watermark day2 ~05:00 -> DROPPED); user 11 lands in day2 02:00 —
    # its ts is behind the watermark but the day2 window is still open
    # -> ACCEPTED; user 12 at day4 pushes the final watermark past
    # day2's end so the final no-data batch emits day2
    f2 = [
        (20, day(1, 20), 4, "click", 1.0, "{}"),
        (21, day(2, 2), 11, "click", 1.0, "{}"),
        (22, day(4, 12), 12, "click", 1.0, "{}"),
    ]
    src = str(tmp_path / "src")
    for i, batch in enumerate([f0, f1, f2]):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(src + f"/f={i}")
    now = time.time()
    for i in range(3):
        for f in glob.glob(src + f"/f={i}/*.parquet"):
            os.utime(f, (now - 600 + i * 200, now - 600 + i * 200))

    stream = read_event_stream(
        spark, src + "/f=*", spark.createDataFrame([], schema).schema,
        max_files_per_trigger=1,
    )
    h = md5_h32(F.col("user_id").cast("string"))
    regs = (
        stream.select(
            "ts",
            F.shiftrightunsigned(h, HLL_W_BITS).alias("idx"),
            hll_rho(h.bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))).alias("rho"),
        )
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("idx"))
        .agg(F.max("rho").alias("M"))
    )
    name = f"hll_late_{uuid.uuid4().hex[:10]}"
    run_stream_to_memory(regs, name, mode="append")
    got = {
        (r["w"]["start"], r["idx"], r["M"]) for r in spark.table(name).collect()
    }
    days_emitted = {d for d, _, _ in got}
    assert days_emitted == {day(1), day(2)}  # day4 = frontier, never emits

    def batch_regs(users, d):
        df = spark.createDataFrame([(u,) for u in users], "user_id long")
        hashed = df.select(md5_h32(F.col("user_id").cast("string")).alias("h"))
        return {(d, r["idx"], r["M"]) for r in hll_registers(hashed).collect()}

    # day1: users 1-3 only — the evicted-window late user 4 is absent
    assert {t for t in got if t[0] == day(1)} == batch_regs([1, 2, 3], day(1))
    # day2: user 10 AND the late-but-open user 11
    assert {t for t in got if t[0] == day(2)} == batch_regs([10, 11], day(2))


def test_stream_merge_versioned_commits_and_history(spark, event_files, tmp_path):
    """Streaming MERGE sink into a versioned table: each non-empty
    micro-batch is one commit; the live table equals the batch
    aggregate; every intermediate version stays time-travel-readable
    and row counts grow monotonically (per-user upserts never shrink
    the table)."""
    import pyspark.sql.functions as F

    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.streaming import (
        read_event_stream,
        run_stream_merge_versioned,
    )

    d, events = event_files
    for f in events.schema.fields:
        if f.dataType.typeName() == "timestamp_ntz":
            events = events.withColumn(f.name, F.col(f.name).cast("timestamp"))
    schema = spark.read.parquet(d).schema
    stream = read_event_stream(spark, d, schema, max_files_per_trigger=2)
    per_user = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    table = str(tmp_path / "vt")
    run_stream_merge_versioned(
        per_user, table, key="user_id", checkpoint_dir=str(tmp_path / "ck")
    )

    eng = Engine(spark=spark)
    hist = eng.history(table)
    assert len(hist) >= 2  # 4 files, 2 per trigger -> >= 2 commits
    assert hist[0]["op"].startswith("stream_create")
    assert all(h["op"] == "merge_upsert" for h in hist[1:])
    rows = [h["rows"] for h in hist]
    assert rows == sorted(rows)

    batch = {r.user_id: r.n for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    live = {r.user_id: r.n for r in eng.read_table(table).collect()}
    assert live == batch
    # an intermediate version is a consistent partial state: subset of
    # users, counts <= final
    mid = {r.user_id: r.n for r in eng.read_table(table, 1).collect()}
    assert mid and all(mid[u] <= batch[u] for u in mid)


def test_stream_cms_state_is_fixed_width_and_never_undercounts(spark, sf_dir):
    """The streaming CMS contract: state (the drained counter table)
    is bounded by the 4x256 sketch geometry no matter the event rate,
    and the count-min estimate is >= exact for every probed key."""
    from quack_reduce_spark.inventory.sketches import CMS_ROWS, CMS_WIDTH
    from quack_reduce_spark.inventory.streaming_live import stream_cms_topk

    out = stream_cms_topk(spark, sf_dir).collect()
    assert 0 < len(out) <= 10
    assert all(r.overcount >= 0 for r in out)
    assert all(r.est_events >= r.exact_events for r in out)
    assert CMS_ROWS * CMS_WIDTH == 1024  # geometry the docstrings quote


def test_stream_append_maintains_zonemap_for_engine_pruning(
    spark, event_files, tmp_path
):
    """The streaming-ingest manifest-maintenance loop: draining a
    multi-batch file stream through run_stream_append_zonemapped
    leaves (a) exactly the batch rows in the table, (b) a CURRENT
    manifest — so the engine's stale-manifest guard allows pruning —
    and (c) a range query through Engine SQL that reads a strict file
    subset and equals the batch filter."""
    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.operators import zonemaps as Z
    from quack_reduce_spark.streaming import (
        read_event_stream,
        run_stream_append_zonemapped,
    )

    _, batch_events = event_files
    # time-clustered source files: each micro-batch then appends a
    # distinct time slice (the shape real ingest has — today's batch
    # holds today's events), so its zone-map entry is prunable
    src = str(tmp_path / "zm_src")
    (
        batch_events.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(src)
    )
    out = str(tmp_path / "zm_sink")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(
        spark, src, batch_events.schema, max_files_per_trigger=1
    )
    run_stream_append_zonemapped(stream, out, ["ts"], ckpt)

    table = spark.read.parquet(out)
    assert table.count() == batch_events.count()
    assert Z.has_zonemap(out)

    eng = Engine(spark=spark)
    eng.register("zm_stream", out)
    lo = batch_events.agg(F.min("ts")).first()[0]
    hi = batch_events.agg(F.max("ts")).first()[0]
    mid = lo + (hi - lo) / 4
    d = eng.df(
        f"SELECT COUNT(*) AS n FROM zm_stream WHERE ts < TIMESTAMP '{mid}'"
    )
    want = table.filter(F.col("ts") < F.lit(mid)).count()
    assert d.first()["n"] == want
    rep = eng.last_zonemap_report.get("zm_stream")
    # 4+ batch files: the quarter-range query must not read them all
    assert rep is not None and rep["files_read"] < rep["files_total"]


def test_stream_append_maintains_group_stats(spark, event_files, tmp_path):
    """r15 (VERDICT r14 #7): the zone-map append sink carries
    ``group_stats_cols`` — after N micro-batch appends on a layout
    where every batch file mixes every event_type, the engine's
    grouped aggregate still answers at ZERO files scanned from the
    per-(file, value) slice partials each batch maintained."""
    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.operators import zonemaps as Z
    from quack_reduce_spark.streaming import (
        read_event_stream,
        run_stream_append_zonemapped,
    )

    src, batch_events = event_files
    out = str(tmp_path / "gs_sink")
    ckpt = str(tmp_path / "gs_ckpt")
    stream = read_event_stream(
        spark, src, batch_events.schema, max_files_per_trigger=1
    )
    run_stream_append_zonemapped(
        stream, out, ["event_type", "event_id"], ckpt,
        group_stats_cols=["event_type"],
    )
    cfg = Z.group_stats_config(out)
    assert "event_type" in cfg and cfg["event_type"]["entries"] > 0
    table = spark.read.parquet(out)
    assert table.count() == batch_events.count()

    eng = Engine(spark=spark)
    eng.register("gs_stream", out)
    d = eng.df(
        "SELECT event_type, COUNT(*) AS n, MIN(event_id) AS mn "
        "FROM gs_stream GROUP BY event_type"
    )
    tele = eng.last_agg_plan
    assert tele is not None and tele["files_scanned"] == 0, tele
    assert tele.get("files_group_stats", 0) >= 1
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            table.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"), F.min("event_id").alias("mn")
            ).collect(),
        )
    )
    assert got == want
    spark.catalog.dropTempView("gs_stream")
