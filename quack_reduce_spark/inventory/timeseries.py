"""Time-series / windowing inventory (events table).

The reference has no streaming surface (SURVEY §2 Tier C — verified
absence); these operators are the north-star additions, implemented
batch-first with Spark's time-window primitives so the exact same
expressions lift to Structured Streaming (see
quack_reduce_spark.streaming). Every batch form is DuckDB-oracle
testable; the streaming forms are unit-tested separately.

Scale notes: ``window()``/``session_window()`` group-bys are ordinary
partial/final hash aggregates — they scale like any groupBy. The as-of
join is one shuffle + one per-partition sort (see operators/asof.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from quack_reduce_spark.inventory._util import load, rnd
from quack_reduce_spark.operators.asof import asof_join, asof_join_auto, asof_join_broadcast


def ts_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window(F.col("ts"), "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def ts_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour length, 30-minute slide (each event lands
    in two windows)."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window(F.col("ts"), "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def ts_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window with a 5-minute inactivity gap, per user.

    Spark semantics: events merge while the next event starts before
    last_ts + gap; the oracle reproduces this with a gaps-and-islands
    window (break when the gap from the previous event is >= 5 min).
    """
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window(F.col("ts"), "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def ts_tumbling_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-aligned tumbling windows: hourly buckets starting at
    :30 (``F.window`` startTime — billing-period / timezone-alignment
    shifts fixed-epoch buckets can't express). Oracle: DuckDB
    time_bucket with the same 30-minute origin offset."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window(F.col("ts"), "1 hour", "1 hour", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def ts_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap: purchases close a session
    after 2 minutes of silence, other events after 5 (dynamic-gap
    ``session_window``, the Spark 3.2+ feature fixed-gap sessions
    can't express). Oracle: gaps-and-islands where a session breaks
    when an event's ts reaches the RUNNING MAX of previous
    (ts + its own gap) — the interval-union semantics the engine
    implements; the fixed-gap lag() trick is insufficient here because
    a long-gap event can outlast several short-gap successors."""
    events = load(spark, sf_dir, "events")
    # string gaps (not INTERVAL exprs): dynamic session_window demands
    # CalendarIntervalType, and the analyzer converts string literals
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("2 minutes")
    ).otherwise(F.lit("5 minutes"))
    return (
        events.groupBy(
            "user_id", F.session_window(F.col("ts"), gap).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the latest at-or-before purchase value
    of the same user (operators/asof.py composite; the reference dialect
    has ASOF JOIN as a Tier-B feature via its SQL passthrough).
    """
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
        suffix="",
    )
    return joined.select("event_id", "user_id", "purchase_value")


def ts_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click gets the EARLIEST at-or-after
    purchase value of the same user (pandas merge_asof
    direction='forward'; the dialect's ASOF JOIN with l.ts <= r.ts).
    Same one-shuffle composite as backward, fill flipped to
    first-over-following."""
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
        suffix="",
        direction="forward",
    )
    return joined.select("event_id", "user_id", "purchase_value")


def ts_asof_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics as ts_asof_join but through the broadcast
    small-right-side plan (operators/asof.py:asof_join_broadcast): the
    per-user purchase history is packed into sorted arrays, broadcast,
    and matched by projection — the click fact is never shuffled or
    window-sorted. Oracle is the identical DuckDB ASOF LEFT JOIN."""
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join_broadcast(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
        suffix="",
    )
    return joined.select("event_id", "user_id", "purchase_value")


def ts_asof_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-dispatched as-of join (operators/asof.py:asof_join_auto):
    a bounded size probe routes the dimension-sized purchase history to
    the broadcast plan here (same result as ts_asof_join_broadcast;
    the big-right route to the union+window composite is plan-asserted
    in tests/test_asof.py). Oracle is the identical DuckDB ASOF LEFT
    JOIN — dispatch must never change semantics."""
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join_auto(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
        suffix="",
    )
    return joined.select("event_id", "user_id", "purchase_value")


ASOF_TOLERANCE_MIN = 30


def ts_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance band (pandas merge_asof
    ``tolerance=``): the latest at-or-before purchase counts only if
    it is within 30 minutes of the click; older matches null out. The
    matched right timestamp rides along as a second value column, so
    tolerance is a post-window projection — no extra join."""
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
        .withColumn("purchase_ts", F.col("ts"))
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value", "purchase_ts"],
        suffix="",
    )
    in_band = F.col("purchase_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE_MIN} MINUTES"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.when(in_band, F.col("purchase_value")).alias("purchase_value"),
        F.coalesce(in_band, F.lit(False)).alias("matched"),
    )


def ts_date_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type rollup — the hypertable-style continuous-aggregate
    shape (date_trunc + groupBy), the batch half of a streaming rollup."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.avg("value"), 4).alias("avg_value"),
        )
    )


def ts_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion funnel: a click converts if the same
    user's NEXT purchase (forward as-of) lands within 1 hour. Daily
    click counts, conversions, and rate — the standard product-
    analytics funnel, built on the forward as-of composite (one keyed
    shuffle; no per-row subquery)."""
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .distinct()
        .withColumn("purchase_ts", F.col("ts"))
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_ts"],
        suffix="",
        direction="forward",
    )
    converted = F.col("purchase_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
    return (
        joined.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.coalesce(converted, F.lit(False)).alias("conv"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count_if(F.col("conv")).alias("n_converted"),
            rnd(F.count_if(F.col("conv")) / F.count(F.lit(1)), 6).alias("conv_rate"),
        )
        .orderBy("day")
    )


RETENTION_MAX_OFFSET = 7


def ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later active day (offset 0..7). Two keyed aggregates + one
    join on user_id — the cohort table is tiny (distinct users) and
    broadcast-eligible; nothing touches raw event rows twice."""
    events = load(spark, sf_dir, "events")
    user_days = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    cohorts = user_days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        user_days.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .filter(F.col("day_offset") <= RETENTION_MAX_OFFSET)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series for one user: a dense hour spine
    generated with sequence()+explode over the observed range, left-
    joined with the hourly counts, empty hours zero-filled — the
    standard sparse-to-dense densification every time-series chart
    needs. The spine generation is a single-row sequence explode
    (no driver loop); the join keys on the hour bucket."""
    events = load(spark, sf_dir, "events").filter(F.col("user_id") == 7)
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    return (
        spine.join(hourly, "hour", "left")
        .select("hour", F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"))
        .orderBy("hour")
    )


def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the gap-filled hourly series: observed
    hours keep their mean value; missing hours get the time-weighted
    blend of the nearest observations on both sides (NULL outside the
    observed range). Two ignore-nulls window fills (last-before,
    first-after) carry value AND timestamp, so the blend is a pure
    projection. Single-entity here; the multi-entity form adds
    partitionBy(user) to both windows and scales like any keyed
    window."""
    events = load(spark, sf_dir, "events").filter(F.col("user_id") == 7)
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(rnd(F.avg("value"), 4).alias("v"))
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    joined = spine.join(hourly, "hour", "left")
    w_prev = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = Window.orderBy("hour").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    prev_v = F.last("v", ignorenulls=True).over(w_prev)
    prev_t = F.last(obs_hour, ignorenulls=True).over(w_prev)
    next_v = F.first("v", ignorenulls=True).over(w_next)
    next_t = F.first(obs_hour, ignorenulls=True).over(w_next)
    # Exact-integer blend: the hourly values are integral in 1e-4
    # units and the time deltas integral seconds, so the interpolation
    # (pi·(dn−dh) + ni·dh)/dn and its half-up rounding
    # floor((2p+q)/(2q)) are computed on BIGINTs — no floating-point
    # anywhere until the final /1e4, which is exact. A pure-double
    # blend lands on exact .5 boundaries (seen at sf0.1) where the two
    # engines' last-ulp differences flip the rounded value.
    pi = F.floor(prev_v * F.lit(1e4) + F.lit(0.5)).cast("long")
    ni = F.floor(next_v * F.lit(1e4) + F.lit(0.5)).cast("long")
    dh = F.unix_timestamp("hour") - F.unix_timestamp(prev_t)
    dn = F.nullif(
        F.unix_timestamp(next_t) - F.unix_timestamp(prev_t), F.lit(0)
    )
    p = pi * (dn - dh) + ni * dh
    blended = F.floor((2 * p + dn) / (2 * dn)) / F.lit(1e4)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(blended)
    return joined.select(
        "hour",
        F.col("v").isNotNull().alias("observed"),
        interp.alias("value"),
    ).orderBy("hour")


ANOMALY_WINDOW = 24  # trailing hours
ANOMALY_Z = 2.0


def ts_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the hourly event-volume
    series: each hour scored against the trailing 24-hour mean/stddev
    (excluding itself); |z| > 2 flags an anomaly. One tumbling
    aggregate plus one bounded ROWS window — at scale the window
    partitions by entity and the trailing frame keeps state at 24 rows
    per key."""
    events = load(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("hour").rowsBetween(-ANOMALY_WINDOW, -1)
    mu = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    z = (F.col("n") - mu) / F.nullif(sd, F.lit(0.0))
    return (
        hourly.select(
            "hour",
            "n",
            rnd(mu, 4).alias("trailing_mean"),
            rnd(F.coalesce(z, F.lit(0.0)), 4).alias("zscore"),
            F.coalesce(F.abs(z) > ANOMALY_Z, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("hour")
    )


def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: mean hourly event volume by (day-of-week,
    hour-of-day) — the heatmap behind capacity planning. Two stacked
    aggregates, both partial/final."""
    events = load(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        hourly.groupBy(
            F.dayofweek("hour").alias("dow"),
            F.hour("hour").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            rnd(F.avg("n"), 4).alias("avg_events"),
        )
        .orderBy("dow", "hod")
    )


def ts_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts via the applyInPandas
    grouped-map operator (operators/grouped.py) — a Python custom
    operator whose semantics happen to have a SQL window equivalent,
    so the DuckDB oracle fully verifies the Arrow/grouped-map path."""
    from quack_reduce_spark.operators.grouped import event_transitions

    return event_transitions(load(spark, sf_dir, "events"))


EWMA_ALPHA = 0.3
EWMA_LAGS = 7  # current observation + 6 trailing
# Exact double weights alpha*(1-alpha)^j, computed ONCE in Python and
# embedded verbatim (repr) in both engines so the FP inputs are
# bit-identical — the same literal-discipline trick the PageRank
# oracle uses for (1-d)/n.
EWMA_WEIGHTS = [EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** j for j in range(EWMA_LAGS)]


def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average of daily event
    volume per event type: y_t = Σ_{j<7} w_j·x_{t-j} / Σ w_j over the
    weights that actually exist (series head uses fewer terms), with
    w_j = α(1-α)^j, α=0.3.

    The truncation is the scale decision, not a shortcut: the exact
    recursive EWMA needs either a sequential scan per key or the
    (1-α)^{-i} prefix-sum rewrite whose intermediates overflow double
    range after ~2000 observations; a 7-term window carries 97.7% of
    the weight mass at α=0.3, is a bounded ROWS frame (7 rows of state
    per key at any scale), and — unlike the recursion — is exactly
    replayable in any engine with lag(). Window partitions by
    event_type, so no global sort exists at any size."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("event_type"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    num = F.lit(EWMA_WEIGHTS[0]) * F.col("n")
    den = F.lit(EWMA_WEIGHTS[0])
    for j in range(1, EWMA_LAGS):
        lagged = F.lag("n", j).over(w)
        num = num + F.coalesce(
            F.lit(EWMA_WEIGHTS[j]) * lagged.cast("double"), F.lit(0.0)
        )
        den = den + F.when(lagged.isNotNull(), F.lit(EWMA_WEIGHTS[j])).otherwise(
            F.lit(0.0)
        )
    return (
        daily.select(
            "event_type",
            "day",
            "n",
            rnd(num / den, 6).alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


QUERIES = {
    "ts_ewma_smooth": ts_ewma_smooth,
    "ts_tumbling_window": ts_tumbling_window,
    "ts_sliding_window": ts_sliding_window,
    "ts_session_window": ts_session_window,
    "ts_session_dynamic_gap": ts_session_dynamic_gap,
    "ts_tumbling_offset": ts_tumbling_offset,
    "ts_asof_join": ts_asof_join,
    "ts_asof_forward": ts_asof_forward,
    "ts_asof_tolerance": ts_asof_tolerance,
    "ts_asof_join_broadcast": ts_asof_join_broadcast,
    "ts_asof_auto": ts_asof_auto,
    "ts_date_rollup": ts_date_rollup,
    "ts_gap_fill": ts_gap_fill,
    "ts_interpolate": ts_interpolate,
    "ts_zscore_anomaly": ts_zscore_anomaly,
    "ts_seasonal_profile": ts_seasonal_profile,
    "ts_conversion_funnel": ts_conversion_funnel,
    "ts_retention_cohorts": ts_retention_cohorts,
    "ts_event_transitions": ts_event_transitions,
}


def _ewma_oracle() -> str:
    """Build the EWMA oracle with the SAME Python-computed double
    weights the Spark side embeds (repr round-trips doubles exactly),
    and the same left-associative summation order."""
    lag_cols = ", ".join(
        f"LAG(n, {j}) OVER (PARTITION BY event_type ORDER BY day) AS l{j}"
        for j in range(1, EWMA_LAGS)
    )
    num = f"{EWMA_WEIGHTS[0]!r} * n"
    den = f"{EWMA_WEIGHTS[0]!r}"
    for j in range(1, EWMA_LAGS):
        num += f" + COALESCE({EWMA_WEIGHTS[j]!r} * CAST(l{j} AS DOUBLE), 0.0)"
        den += (
            f" + CASE WHEN l{j} IS NOT NULL THEN {EWMA_WEIGHTS[j]!r}"
            " ELSE 0.0 END"
        )
    return f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT event_type, day, n, {lag_cols}
            FROM daily
        )
        SELECT event_type, day, n,
               FLOOR((({num}) / ({den})) * 1e6 + 0.5) / 1e6 AS ewma
        FROM lagged
        ORDER BY event_type, day
    """


ORACLES = {
    "ts_ewma_smooth": _ewma_oracle(),
    "ts_tumbling_window": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               COUNT(*) AS n_events,
               FLOOR((SUM(value)) * 1e4 + 0.5) / 1e4 AS sum_value
        FROM events GROUP BY 1
    """,
    "ts_sliding_window": """
        WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b0 FROM events),
        expanded AS (
            SELECT b0 AS ws FROM b
            UNION ALL
            SELECT b0 - INTERVAL '30 minutes' AS ws FROM b
        )
        SELECT ws AS window_start, COUNT(*) AS n_events
        FROM expanded GROUP BY 1
    """,
    "ts_session_window": """
        WITH d AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '5 minutes'
                        THEN 1 ELSE 0 END AS brk
            FROM events
        ),
        s AS (
            SELECT user_id, ts, value,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM d
        )
        SELECT user_id, MIN(ts) AS session_start,
               COUNT(*) AS n_events,
               FLOOR((SUM(value)) * 1e4 + 0.5) / 1e4 AS sum_value
        FROM s GROUP BY user_id, sid
    """,
    "ts_tumbling_offset": """
        SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes')
                   AS window_start,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
    """,
    "ts_session_dynamic_gap": """
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
    "ts_asof_join": """
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id, ts, MAX(value) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        )
        SELECT c.event_id, c.user_id, p.purchase_value
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "ts_asof_join_broadcast": """
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id, ts, MAX(value) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        )
        SELECT c.event_id, c.user_id, p.purchase_value
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "ts_asof_auto": """
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id, ts, MAX(value) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        )
        SELECT c.event_id, c.user_id, p.purchase_value
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "ts_asof_forward": """
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id, ts, MAX(value) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        )
        SELECT c.event_id, c.user_id, p.purchase_value
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
    "ts_asof_tolerance": """
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id, ts, MAX(value) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        )
        SELECT c.event_id, c.user_id,
               CASE WHEN p.ts >= c.ts - INTERVAL '30 minutes'
                    THEN p.purchase_value END AS purchase_value,
               COALESCE(p.ts >= c.ts - INTERVAL '30 minutes', FALSE) AS matched
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "ts_date_rollup": """
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n,
               FLOOR((AVG(value)) * 1e4 + 0.5) / 1e4 AS avg_value
        FROM events GROUP BY 1, 2
    """,
    "ts_seasonal_profile": """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
            FROM events GROUP BY 1
        )
        SELECT CAST(EXTRACT(dow FROM hour) + 1 AS INT) AS dow,
               CAST(EXTRACT(hour FROM hour) AS INT) AS hod,
               COUNT(*) AS n_hours,
               FLOOR((AVG(n)) * 1e4 + 0.5) / 1e4 AS avg_events
        FROM hourly
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "ts_zscore_anomaly": """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
            FROM events GROUP BY 1
        ),
        f AS (
            SELECT hour, n,
                   AVG(n) OVER (ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS mu,
                   stddev_samp(n) OVER (ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS sd
            FROM hourly
        )
        SELECT hour, n,
               FLOOR((mu) * 1e4 + 0.5) / 1e4 AS trailing_mean,
               FLOOR((COALESCE((n - mu) / NULLIF(sd, 0.0), 0.0)) * 1e4 + 0.5) / 1e4 AS zscore,
               COALESCE(ABS((n - mu) / NULLIF(sd, 0.0)) > 2.0, FALSE) AS is_anomaly
        FROM f
        ORDER BY hour
    """,
    "ts_interpolate": """
        WITH e AS (SELECT ts, value FROM events WHERE user_id = 7),
        b AS (
            SELECT date_trunc('hour', MIN(ts)) AS lo,
                   date_trunc('hour', MAX(ts)) AS hi
            FROM e
        ),
        spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour FROM b
        ),
        hourly AS (
            SELECT date_trunc('hour', ts) AS hour,
                   FLOOR((AVG(value)) * 1e4 + 0.5) / 1e4 AS v
            FROM e GROUP BY 1
        ),
        j AS (
            SELECT s.hour, h.v FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
        ),
        f AS (
            SELECT hour, v,
                   last_value(v IGNORE NULLS) OVER (ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
                   last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
                       OVER (ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
                   first_value(v IGNORE NULLS) OVER (ORDER BY hour
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
                   first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
                       OVER (ORDER BY hour
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
            FROM j
        )
        , g AS (
            SELECT hour, v,
                   CAST(FLOOR(prev_v * 1e4 + 0.5) AS BIGINT) AS pi,
                   CAST(FLOOR(next_v * 1e4 + 0.5) AS BIGINT) AS ni,
                   CAST(epoch(hour) - epoch(prev_t) AS BIGINT) AS dh,
                   NULLIF(CAST(epoch(next_t) - epoch(prev_t) AS BIGINT), 0)
                       AS dn
            FROM f
        )
        SELECT hour,
               v IS NOT NULL AS observed,
               -- exact-integer half-up blend: floor((2p+q)/(2q))/1e4,
               -- p = pi*(dn-dh) + ni*dh — see the Spark twin
               CASE WHEN v IS NOT NULL THEN v
                    ELSE FLOOR((2 * (pi * (dn - dh) + ni * dh) + dn)
                               / (2 * dn)) / 1e4
               END AS value
        FROM g
        ORDER BY hour
    """,
    "ts_gap_fill": """
        WITH e AS (SELECT ts FROM events WHERE user_id = 7),
        b AS (
            SELECT date_trunc('hour', MIN(ts)) AS lo,
                   date_trunc('hour', MAX(ts)) AS hi
            FROM e
        ),
        spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour FROM b
        ),
        hourly AS (
            SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
            FROM e GROUP BY 1
        )
        SELECT s.hour, COALESCE(h.n_events, 0) AS n_events
        FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
        ORDER BY s.hour
    """,
    "ts_conversion_funnel": """
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        j AS (
            SELECT c.ts,
                   COALESCE(p.ts <= c.ts + INTERVAL '1 hour', FALSE) AS conv
            FROM clicks c
            ASOF LEFT JOIN purchases p
              ON c.user_id = p.user_id AND c.ts <= p.ts
        )
        SELECT date_trunc('day', ts) AS day,
               COUNT(*) AS n_clicks,
               CAST(count_if(conv) AS BIGINT) AS n_converted,
               FLOOR((CAST(count_if(conv) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS conv_rate
        FROM j
        GROUP BY 1
        ORDER BY 1
    """,
    "ts_retention_cohorts": """
        WITH user_days AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ),
        cohorts AS (
            SELECT user_id, MIN(day) AS cohort_day FROM user_days GROUP BY user_id
        )
        SELECT c.cohort_day,
               CAST(date_diff('day', c.cohort_day, d.day) AS INT) AS day_offset,
               COUNT(DISTINCT d.user_id) AS n_users
        FROM user_days d JOIN cohorts c ON d.user_id = c.user_id
        WHERE date_diff('day', c.cohort_day, d.day) <= 7
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "ts_event_transitions": """
        WITH seq AS (
            SELECT user_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts ASC, event_id ASC) AS from_type,
                   event_type AS to_type
            FROM events
        )
        SELECT user_id, from_type, to_type, COUNT(*) AS n
        FROM seq
        WHERE from_type IS NOT NULL
        GROUP BY user_id, from_type, to_type
    """,
}
