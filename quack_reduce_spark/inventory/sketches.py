"""Portable-sketch inventory: KMV / theta-union / HLL / count-min,
hash-oracled end to end.

inventory/approx.py covers Spark's NATIVE sketches
(approx_count_distinct = HLL++, approx_percentile) rows-only — their
register internals are engine-specific by construction. These queries
are the differential-verification twins: the same public sketch math
over the engine-portable md5 32-bit hash family, so the DuckDB oracle
replays every register/counter and the driver hash-gates the final
ESTIMATES, not just row counts. The pairing mirrors the
minhash/simhash production-vs-portable pattern (inventory/dedup.py).

Why sketches are first-class for the 100 TB pipeline: distinct users/
URLs/doc-ids per slice and heavy-hitter detection are the metadata
queries a curation pipeline runs constantly; exact distinct shuffles
every key, while a sketch ships a FIXED-size, associatively-mergeable
summary per partition (k hashes / 256 registers / 4x256 counters) —
partition count, not data volume, bounds the final reduce.

Cross-engine FP notes: estimates divide exact integers into doubles
and multiply by dyadic constants (2^32, 2^-M) — IEEE-deterministic in
both engines; the one non-dyadic constant (HLL's alpha_256) is
embedded via Python repr in BOTH expressions; all reported floats go
through the portable floor-half-up rnd.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load, rnd
from quack_reduce_spark.operators.sketches import (
    HLL_ALPHA,
    HLL_M,
    HLL_W_BITS,
    H32_SPAN,
    cms_bucket_sql,
    cms_buckets,
    hll_registers,
    hll_rho,
    hll_rho_sql,
    join_rows_estimate,
    key_count_sample,
    key_count_sample_from_counts,
    kmv_estimate,
    kmv_per_group,
    kmv_topk_lists,
    md5_h32,
    md5_h32_sql,
    topn_sample_lists,
)

KMV_K = 64
CMS_ROWS = 4
CMS_WIDTH = 256
CMS_TOP = 10
THETA_A = "1-URGENT"
THETA_B = "2-HIGH"
TOPN_N = 512


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority distinct-customer estimate from a k=64 KMV sketch,
    reported against the exact distinct with its relative error — the
    sliced-cardinality readout (distinct users per slice) every
    curation pipeline runs. One hashed distinct + the two-level
    salt-tree top-k (operators/sketches.py::kmv_per_group); the sketch
    frame never exceeds k rows per group."""
    orders = load(spark, sf_dir, "orders")
    hashed = orders.select(
        "o_orderpriority", md5_h32(F.col("o_custkey").cast("string")).alias("h")
    ).distinct()
    summary = kmv_per_group(hashed, "o_orderpriority", KMV_K)
    exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_custs")
    )
    est = kmv_estimate(F.col("kth"), F.col("got"), KMV_K)
    return (
        summary.join(exact, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("got").alias("sketch_size"),
            rnd(est, 4).alias("est_custs"),
            "exact_custs",
            rnd(
                F.abs(est - F.col("exact_custs")) / F.col("exact_custs"), 4
            ).alias("rel_err"),
        )
        .orderBy("o_orderpriority")
    )


def sketch_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-style sketch UNION: the five per-priority KMV sketches
    from sketch_kmv_distinct merge — k smallest of the union of the
    per-group k-smallest — into one global distinct-customer estimate.
    The merge is the whole point of sketches at 100 TB: partial
    sketches flow up the tree as k-row frames; the raw keys are never
    re-shuffled. Output: one row (k, est, exact, rel_err)."""
    orders = load(spark, sf_dir, "orders")
    hashed = orders.select(
        "o_orderpriority", md5_h32(F.col("o_custkey").cast("string")).alias("h")
    ).distinct()
    # per-group sketch LISTS (salt-tree, kmv_topk_lists), then the
    # theta merge: union the lists, dedup (a hash can sit in two
    # groups' sketches), re-take k smallest — a <=|groups|*k-row
    # problem, no window over raw hashes anywhere
    partials = (
        kmv_topk_lists(hashed, "o_orderpriority", KMV_K)
        .select(F.explode("__tk").alias("h"))
        .distinct()
    )
    merged = partials.agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, KMV_K).alias("__tk")
    ).select(
        F.element_at("__tk", F.array_size("__tk")).alias("kth"),
        F.array_size("__tk").cast("long").alias("got"),
    )
    exact = orders.agg(F.count_distinct("o_custkey").alias("exact_custs"))
    est = kmv_estimate(F.col("kth"), F.col("got"), KMV_K)
    return merged.crossJoin(exact).select(
        F.lit(KMV_K).alias("k"),
        rnd(est, 4).alias("est_custs"),
        "exact_custs",
        rnd(F.abs(est - F.col("exact_custs")) / F.col("exact_custs"), 4).alias(
            "rel_err"
        ),
    )


def _hll_est_col():
    """Estimate column over a frame carrying (nonzero, present_sum):
    Flajolet bias-corrected harmonic mean with empty registers folded
    in as 2^0 terms, plus the published small-range correction — below
    ~2.5m the raw estimator is heavily biased, and with empty
    registers present linear counting m*ln(m/V) is the fix. F.log vs
    DuckDB ln() is the established cross-engine pairing
    (text_char_entropy et al.)."""
    raw = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        / (F.col("present_sum") + (F.lit(HLL_M) - F.col("nonzero")))
    )
    return F.when(
        (F.col("nonzero") < HLL_M) & (raw <= F.lit(2.5 * HLL_M)),
        F.lit(float(HLL_M))
        * F.log(F.lit(float(HLL_M)) / (F.lit(HLL_M) - F.col("nonzero"))),
    ).otherwise(raw)


def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HLL (p=8, 256 registers) distinct-part estimate over
    lineitem — register index = top 8 hash bits, rho = first-1-bit
    ladder (no float log2: libm-dependent at exact powers of two),
    Flajolet bias-corrected harmonic mean with empty registers folded
    in as 2^0 terms, plus the published small-range linear-counting
    branch (m*ln(m/V) when the raw estimate is under 2.5m and empty
    registers exist). max(rho) is idempotent so the scan needs NO distinct
    pass and partials merge map-side — the fixed-256-row shape is the
    whole scale story. Output: one row with the register census,
    estimate, exact, rel_err."""
    li = load(spark, sf_dir, "lineitem")
    hashed = li.select(md5_h32(F.col("l_partkey").cast("string")).alias("h"))
    regs = hll_registers(hashed)
    sums = regs.agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("present_sum"),
    )
    exact = li.agg(F.count_distinct("l_partkey").alias("exact_parts"))
    est = _hll_est_col()
    return sums.crossJoin(exact).select(
        F.lit(HLL_M).alias("m"),
        F.col("nonzero").alias("regs_nonzero"),
        rnd(est, 4).alias("est_parts"),
        "exact_parts",
        rnd(F.abs(est - F.col("exact_parts")) / F.col("exact_parts"), 4).alias(
            "rel_err"
        ),
    )


def sketch_hll_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user (DAU) estimates from per-window HLL
    sketches over the events stream — THE production sketch shape: one
    fixed-width register set PER WINDOW, partials merging map-side
    within each day, daily sketches mergeable into weekly/monthly
    rollups without touching raw events again (max per register is the
    merge). Output: (day, regs_nonzero, est_users, exact_users,
    rel_err) — each day's ESTIMATE hash-gated against the DuckDB
    register replay. Fixture cardinalities sit in the linear-counting
    regime (the global lineitem sketch covers the raw-branch regime)."""
    ev = load(spark, sf_dir, "events")
    hashed = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        md5_h32(F.col("user_id").cast("string")).alias("h"),
    )
    regs = (
        hashed.select(
            "day",
            F.shiftrightunsigned(F.col("h"), HLL_W_BITS).alias("idx"),
            hll_rho(F.col("h").bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))).alias("rho"),
        )
        .groupBy("day", "idx")
        .agg(F.max("rho").alias("M"))
    )
    sums = regs.groupBy("day").agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("present_sum"),
    )
    exact = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count_distinct("user_id").alias("exact_users")
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


def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register MERGE — the roll-up sketch_hll_windowed promises:
    the per-day register tables union into ONE global sketch by
    max-per-register-index, WITHOUT re-touching raw events (the input
    here is the |days|x256-row register frame, not the fact table).
    Because max is associative/commutative/idempotent, the merged
    sketch must equal the direct one-pass global sketch REGISTER FOR
    REGISTER — reported as regs_mismatch (must be 0, a theorem in
    executable form, the HLL half of test_kmv_union's identity) —
    and the merged estimate is scored against the exact global
    distinct-user count. This is the production rollup: daily sketches
    persist, weekly/monthly/all-time readouts are register maxes over
    sketch-sized frames."""
    ev = load(spark, sf_dir, "events")
    h = md5_h32(F.col("user_id").cast("string"))
    prepared = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.shiftrightunsigned(h, HLL_W_BITS).alias("idx"),
        hll_rho(h.bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))).alias("rho"),
    )
    daily = prepared.groupBy("day", "idx").agg(F.max("rho").alias("M"))
    merged = daily.groupBy("idx").agg(F.max("M").alias("M"))
    direct = prepared.groupBy("idx").agg(F.max("rho").alias("M"))
    mismatch = (
        merged.select("idx", F.col("M").alias("m_merged"))
        .join(direct.select("idx", F.col("M").alias("m_direct")), "idx", "full")
        .filter(~F.col("m_merged").eqNullSafe(F.col("m_direct")))
        .agg(F.count(F.lit(1)).alias("regs_mismatch"))
    )
    sums = merged.agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("present_sum"),
    )
    exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    est = _hll_est_col()
    return (
        sums.crossJoin(exact)
        .crossJoin(mismatch)
        .select(
            F.lit(HLL_M).alias("m"),
            F.col("nonzero").alias("regs_nonzero"),
            "regs_mismatch",
            rnd(est, 4).alias("est_users"),
            "exact_users",
            rnd(F.abs(est - F.col("exact_users")) / F.col("exact_users"), 4).alias(
                "rel_err"
            ),
        )
    )


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters: 4x256 salted-md5 counters over
    lineitem rows, per-supplier estimate = min over the 4 rows'
    counters, top-10 by estimate with the exact count and the
    (provably non-negative) overcount alongside. The counter table is
    1024 cells regardless of data volume — partials merge by cell-wise
    sum in the map-side combine, and the per-key probe joins a
    broadcast-sized frame."""
    li = load(spark, sf_dir, "lineitem")
    # ONE fact-sized shuffle: the per-key count (partial-aggregated
    # map-side). Counters build from it by bucket-wise SUM — additive
    # merge is count-min's defining mergeability, so this equals
    # hashing every raw row (which the DuckDB oracle replays) while
    # the md5s run over |keys| rows, not |fact| rows. Every other
    # frame here is sketch- or key-sized.
    per_key = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("exact_rows"))
    keyed = per_key.select(
        "l_suppkey",
        "exact_rows",
        F.posexplode(cms_buckets(F.col("l_suppkey").cast("string"), CMS_ROWS, CMS_WIDTH)).alias(
            "r", "bucket"
        ),
    ).localCheckpoint(eager=False)  # feeds counters AND probes
    counters = keyed.groupBy("r", "bucket").agg(F.sum("exact_rows").alias("cnt"))
    est = (
        keyed.select("l_suppkey", "r", "bucket")
        .join(counters, ["r", "bucket"])
        .groupBy("l_suppkey")
        .agg(F.min("cnt").alias("est_rows"))
    )
    exact = per_key
    return (
        est.join(exact, "l_suppkey")
        .select(
            "l_suppkey",
            "est_rows",
            "exact_rows",
            (F.col("est_rows") - F.col("exact_rows")).alias("overcount"),
        )
        .orderBy(F.col("est_rows").desc(), F.col("l_suppkey").asc())
        .limit(CMS_TOP)
    )


def sketch_theta_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET EXPRESSIONS — the other half of the r8 union:
    distinct-customer estimates for A∩B and A\\B over two order-
    priority slices, the query a pipeline runs constantly (users
    active in two slices, train/eval contamination overlap). Public
    DataSketches theta formulation: theta = min(theta_A, theta_B)
    where theta_X = the k-th smallest hash (2^32 = "everything
    retained" when the sketch isn't full); below theta each sketch is
    an EXACT membership record of its slice's hashes, so
    |S_A ∩ S_B ∩ [0,theta)| / (theta/2^32) estimates |A∩B| and the
    except-side likewise estimates |A\\B|. All set algebra runs on two
    k-row arrays (one 1x1 join); only the per-slice sketch build and
    the exact-answer aggregate touch the fact table. Errors are
    reported against the exact overlap (one flag aggregation)."""
    orders = load(spark, sf_dir, "orders")
    sliced = orders.filter(F.col("o_orderpriority").isin(THETA_A, THETA_B))
    hashed = sliced.select(
        "o_orderpriority", md5_h32(F.col("o_custkey").cast("string")).alias("h")
    ).distinct()
    # two sketch rows, referenced once per slice below; the chain's
    # exchanges are canonically identical across the two references,
    # so ReuseExchange shares the heavy shuffles — an r16 A/B
    # measured a lazy checkpoint here ~20% SLOWER (persist overhead
    # exceeds the reused-exchange replay) and kept the lazy plan
    lists = kmv_topk_lists(hashed, "o_orderpriority", KMV_K)
    a = lists.filter(F.col("o_orderpriority") == THETA_A).select(
        F.col("__tk").alias("ta")
    )
    b = lists.filter(F.col("o_orderpriority") == THETA_B).select(
        F.col("__tk").alias("tb")
    )

    def theta(arr):
        return F.when(F.array_size(arr) < KMV_K, F.lit(H32_SPAN)).otherwise(
            F.element_at(arr, F.array_size(arr)).cast("double")
        )

    def below(arr):
        return F.size(F.filter(arr, lambda x: x.cast("double") < F.col("th")))

    pair = (
        a.crossJoin(b)  # 1x1: two sketch rows
        .withColumn("th", F.least(theta(F.col("ta")), theta(F.col("tb"))))
        .select(
            F.array_size("ta").cast("long").alias("got_a"),
            F.array_size("tb").cast("long").alias("got_b"),
            "th",
            below(F.array_intersect("ta", "tb")).cast("long").alias("n_inter"),
            below(F.array_except("ta", "tb")).cast("long").alias("n_diff_ab"),
        )
    )
    flags = sliced.groupBy("o_custkey").agg(
        F.max((F.col("o_orderpriority") == THETA_A).cast("int")).alias("ha"),
        F.max((F.col("o_orderpriority") == THETA_B).cast("int")).alias("hb"),
    )
    ex = flags.agg(
        F.sum(F.col("ha") * F.col("hb")).cast("long").alias("exact_inter"),
        F.sum(F.col("ha") * (1 - F.col("hb"))).cast("long").alias("exact_diff_ab"),
    )
    est_i = F.col("n_inter") * F.lit(H32_SPAN) / F.col("th")
    est_d = F.col("n_diff_ab") * F.lit(H32_SPAN) / F.col("th")
    return pair.crossJoin(ex).select(
        F.lit(KMV_K).alias("k"),
        "got_a",
        "got_b",
        "n_inter",
        rnd(est_i, 4).alias("est_inter"),
        "exact_inter",
        rnd(F.abs(est_i - F.col("exact_inter")) / F.col("exact_inter"), 4).alias(
            "rel_err_inter"
        ),
        "n_diff_ab",
        rnd(est_d, 4).alias("est_diff_ab"),
        "exact_diff_ab",
        rnd(F.abs(est_d - F.col("exact_diff_ab")) / F.col("exact_diff_ab"), 4).alias(
            "rel_err_diff"
        ),
    )


def sketch_topn_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE stratified sample quantiles — the bounded-memory twin
    of sketch_sampled_quantiles: that query's fixed-RATE 1-in-8 hash
    sample still grows linearly with the data, while this one keeps
    exactly TOPN_N rows per group (the rows with the n smallest
    md5(event_id) hashes — a bottom-n hash sample, mergeable by
    union + re-rank exactly like KMV, built on the same balanced salt
    tree via operators/sketches.py::topn_sample_lists). At 100 TB the
    per-group state is n structs regardless of event volume, and
    yesterday's sample unions with today's by re-slicing. Same
    error-reporting contract as the rate twin: per-type sampled vs
    exact p50/p95 with absolute errors, all hash-gated."""
    ev = load(spark, sf_dir, "events")
    keyed = ev.select(
        "event_type",
        md5_h32(F.col("event_id").cast("string")).alias("h"),
        F.col("value").alias("v"),
    )
    # r16 REJECTED experiment (kept as a warning): folding the auto-
    # fanout count into the exact-percentile aggregate (count +
    # percentiles in one groupBy, lazily checkpointed, fans derived
    # from the checkpointed frame) removes one fact scan (3 -> 2) but
    # measured 15-20% SLOWER across 4 paired fresh-process A/B rounds
    # at sf0.1 (ctrl mins 0.92/0.94/1.04/1.07 vs head mins
    # 1.05/1.17/1.26/1.49): the fat percentile aggregate becomes a
    # SEQUENTIAL broadcast prerequisite of the sample-tree job, while
    # this shape's broadcast prerequisite is only the cheap column-
    # pruned count scan and the exact aggregate overlaps the sample
    # tree inside one job (same job-barrier economics as the pagerank
    # checkpoint rejection — see OPTIMIZATION_r16.md).
    smp = topn_sample_lists(keyed, "event_type", TOPN_N)
    sampled = smp.select("event_type", F.explode("__smp").alias("s")).select(
        "event_type", F.col("s.v").alias("value")
    )
    s = sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        rnd(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("p50_sampled"),
        rnd(F.percentile(F.col("value"), F.lit(0.95)), 4).alias("p95_sampled"),
    )
    e = ev.groupBy("event_type").agg(
        rnd(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("p50_exact"),
        rnd(F.percentile(F.col("value"), F.lit(0.95)), 4).alias("p95_exact"),
    )
    return (
        s.join(e, "event_type")
        .select(
            "event_type",
            "n_sampled",
            "p50_sampled",
            "p50_exact",
            rnd(F.abs(F.col("p50_sampled") - F.col("p50_exact")), 4).alias("err_p50"),
            "p95_sampled",
            "p95_exact",
            rnd(F.abs(F.col("p95_sampled") - F.col("p95_exact")), 4).alias("err_p95"),
        )
        .orderBy("event_type")
    )


JOINCARD_N = 128  # bottom-n key sample size for join-size estimation
JOINCARD_YEAR_A, JOINCARD_YEAR_B = 1996, 1997


def sketch_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE estimation from key sketches — the planner question
    every optimizer asks before picking a join strategy: how many rows
    will A ⋈ B produce? Each side folds to (key, count), takes the
    bottom-JOINCARD_N hash sample CARRYING the counts (the
    topn_sample_lists tree — a theta sketch whose payload is the key's
    multiplicity), and the estimate is sum(cntA*cntB) over hash-matched
    sampled keys below theta, scaled by 1/theta_frac. Below
    min(theta_A, theta_B) each sample is an exact (key→count) record
    of its side, so the estimator is the standard theta-sketch ratio
    estimator over the key population; when neither sample fills it is
    EXACT (tested). Demonstrated on a real self-join shape: lineitem
    shipped in 1994 vs 1995 on l_partkey; the exact answer is computed
    as the count aggregate join (never materializing the pair blowup).
    All estimation arithmetic runs on two <=n-struct arrays — the
    sketches are what you'd ship to a planner at 100 TB."""
    li = load(spark, sf_dir, "lineitem")

    def side(year: int) -> DataFrame:
        # each side's (key, count) fold feeds BOTH the bottom-n sample
        # build and the exact join-size aggregate through the SAME
        # DataFrame (key_count_sample_from_counts), so the fold's
        # exchange is structurally shared (ReuseExchange) instead of
        # relying on two separately-built plans canonicalizing equal;
        # an r16 A/B measured an added checkpoint here ~12% slower
        # (cheap post-shuffle agg — persist costs more than replay)
        return (
            li.filter(F.year("l_shipdate") == year)
            .groupBy(F.col("l_partkey").alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    a, b = side(JOINCARD_YEAR_A), side(JOINCARD_YEAR_B)

    # shared planner machinery (operators/sketches.py — the same
    # functions Engine.explain_join ships): bottom-n key-count theta
    # samples + the ratio estimator over their hash-matched keys,
    # built from the SAME per-side counts the exact aggregate reads
    sa = key_count_sample_from_counts(a, JOINCARD_N)
    sb = key_count_sample_from_counts(b, JOINCARD_N)
    est_row = join_rows_estimate(sa, sb, JOINCARD_N)

    exact = (
        a.select("k", F.col("cnt").alias("ca"))
        .join(b.select("k", F.col("cnt").alias("cb")), "k")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("exact_join_rows"))
    )
    est = F.col("est_join_rows")
    return (
        est_row.drop("sum_prod")
        .crossJoin(exact)
        .select(
            F.lit(JOINCARD_N).alias("n"),
            "got_a",
            "got_b",
            "n_common_sampled",
            rnd(est, 4).alias("est_join_rows"),
            "exact_join_rows",
            rnd(
                F.abs(est - F.col("exact_join_rows")) / F.col("exact_join_rows"), 4
            ).alias("rel_err"),
        )
    )


def sketch_join_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch layer DRIVING a real planning decision
    (Engine.explain_join / plan_join): orders ⋈ (customers with
    acctbal > 9000) is the shape static stats get wrong — the dim
    side is a filtered slice of a table whose FILE size is what the
    size-only stats visitor sees, so without column stats the
    optimizer would sort-merge. The engine instead runs the
    ANALYZE-style pass: exact row counts per side, schema-derived row
    widths, and the bottom-n key-count theta samples feeding the
    join-rows ratio estimator (the exact machinery
    ``sketch_join_cardinality`` hash-gates, shared via
    operators/sketches.py), then emits the broadcast decision. The
    estimate and both row counts are hash-gated against a DuckDB
    replay; the decision itself is gated in-query (_require: the
    slice side must come out 'broadcast_right' under the 10 MB
    default) and the resulting BroadcastHashJoin plan is asserted in
    tests/test_plans.py."""
    import math

    from quack_reduce_spark.engine import Engine

    orders = load(spark, sf_dir, "orders")
    dim = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > BLOOM_ACCTBAL_MIN)
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    eng = Engine(spark=spark)
    rep = eng.explain_join(orders, dim, "o_custkey", n=JOINCARD_N)
    _jp_require(
        rep["strategy"] == "broadcast_right",
        f"planner failed to pick broadcast for the slice side: {rep}",
    )
    exact = orders.join(dim.select("o_custkey"), "o_custkey").count()
    est4 = math.floor(rep["est_join_rows"] * 1e4 + 0.5) / 1e4  # == _RND4
    row = [(
        JOINCARD_N,
        rep["left"]["rows"],
        rep["right"]["rows"],
        rep["n_common_sampled"],
        est4,
        exact,
        rep["strategy"],
    )]
    return spark.createDataFrame(
        row,
        "n int, rows_fact long, rows_dim long, n_common_sampled long, "
        "est_join_rows double, exact_join_rows long, strategy string",
    )


def _jp_require(cond: bool, msg: str) -> None:
    if not cond:
        raise AssertionError(msg)


BLOOM_ACCTBAL_MIN = 9000.0  # qualifying-customer slice for the bloom demo


def sketch_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter SEMI-JOIN pre-filter — the scan-side join-pushdown
    pattern every 100 TB engine lives on (Spark's AQE runtime bloom
    join, Parquet row-group dictionary pruning): the qualifying-key set
    (customers with acctbal > 9000) folds into a bitset SIZED FROM THE
    KEY COUNT (m = 10 bits/key at ~1% target fp, k = 7 — pure integer
    arithmetic via operators.sketches.bloom_size, so the oracle derives
    the identical m from its own COUNT(*)), built by one bit_or
    aggregate (OR-mergeable like HLL registers), which ships into the
    orders scan as a row-local literal-array expression
    (operators/sketches.py::bloom_pass_expr — zero joins, zero shuffle
    on the probe side). Reported against the exact semi-join in ONE
    fact pass: no-false-negatives is hash-gated (n_missed must be 0 —
    every true member passes the filter, by construction), false
    positives are counted and rated; sizing keeps fp ~1% at ANY key
    count where the round-9 fixed 8184-bit filter would saturate
    (tests/test_sketches.py::test_bloom_sized_beats_saturated_fixed_m).
    The driver-side materializations are the key COUNT (one long —
    every engine's planner reads this before sizing a runtime filter)
    and the bitset itself (m/62 longs, ~n_keys/6 — bounded by the
    DIMENSION side's cardinality, never the fact's)."""
    from quack_reduce_spark.operators.reuse import reuse_persist
    from quack_reduce_spark.operators.sketches import (
        BLOOM_SIZED_K,
        bloom_filter_frame,
        bloom_size,
        bloom_words,
    )

    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    # the key set is reused three times within this one call (count,
    # bitset build, exact-side broadcast build): persist it so the
    # customer scan + distinct runs once, not per consumer (persist,
    # not localCheckpoint — lineage survives executor loss)
    keys = reuse_persist(
        cust.filter(F.col("c_acctbal") > BLOOM_ACCTBAL_MIN)
        .select(F.col("c_custkey").alias("k"))
        .distinct(),
        "bloom_semijoin.keys",
    )
    k = BLOOM_SIZED_K
    n_keys = keys.count()  # ONE action: materializes the cache AND counts
    words_n, m = bloom_size(n_keys)
    wrows = bloom_words(keys, "k", m=m, k=k).collect()  # m/62 longs
    dense = [0] * words_n
    for r in wrows:
        dense[int(r["word_idx"])] = int(r["word"])
    joined = orders.join(
        F.broadcast(keys.withColumnRenamed("k", "o_custkey").withColumn(
            "__m", F.lit(1)
        )),
        "o_custkey",
        "left",
    )
    # bounded transport: literal array under BLOOM_LITERAL_MAX_WORDS,
    # broadcast data above it — identical bits either way
    flagged = bloom_filter_frame(
        joined, dense, F.col("o_custkey").cast("string"), k=k
    ).select(
        "bp",
        F.coalesce(F.col("__m"), F.lit(0)).alias("mem"),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.count_if(F.col("bp")).alias("n_bloom_pass"),
        F.sum("mem").cast("long").alias("n_exact"),
        F.count_if(F.col("bp") & (F.col("mem") == 0)).alias("n_false_pos"),
        F.count_if(~F.col("bp") & (F.col("mem") == 1)).alias("n_missed"),
    )
    # n_keys was already materialized above (it sized the filter):
    # report it as a literal instead of re-running the keys subquery
    # as a fourth job + crossJoin
    return agg.select(
        F.lit(m).cast("long").alias("m_bits"),
        F.lit(k).alias("k"),
        F.lit(n_keys).cast("long").alias("n_keys"),
        "n_fact",
        "n_bloom_pass",
        "n_exact",
        "n_false_pos",
        "n_missed",
        rnd(
            F.col("n_false_pos") / (F.col("n_fact") - F.col("n_exact")), 4
        ).alias("fp_rate"),
    )


SAMPLE_MOD = 8  # deterministic 1-in-8 hash sample


def sketch_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type quantile estimates from a DETERMINISTIC 1-in-8
    hash sample (md5(event_id) % 8 == 0) against the exact
    percentiles — the portable twin of the rows-only native
    approx_percentile (KLL), closing the quantile half of the sketch
    family the way the HLL twins closed distinct-count. Hash sampling
    beats df.sample for this exactly like ml_train_split's argument:
    the sampled SET is a pure function of the keys, stable under
    repartitioning and incremental appends (yesterday's sample rows
    stay sampled), and two tables sampled on a shared key stay
    join-consistent. Scale: the sample is a fixed fraction ->
    percentile sort cost shrinks 8x and partial aggregation bounds it
    per group; samples merge by union. F.percentile == DuckDB
    quantile_cont (b2_percentiles pairing), so the ESTIMATES
    hash-match. Output: one row per event_type with sampled/exact
    p50+p95 and absolute errors."""
    ev = load(spark, sf_dir, "events")
    sampled = ev.filter(
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % SAMPLE_MOD
        == 0
    )
    s = sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        rnd(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("p50_sampled"),
        rnd(F.percentile(F.col("value"), F.lit(0.95)), 4).alias("p95_sampled"),
    )
    e = ev.groupBy("event_type").agg(
        rnd(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("p50_exact"),
        rnd(F.percentile(F.col("value"), F.lit(0.95)), 4).alias("p95_exact"),
    )
    return (
        s.join(e, "event_type")
        .select(
            "event_type",
            "n_sampled",
            "p50_sampled",
            "p50_exact",
            rnd(F.abs(F.col("p50_sampled") - F.col("p50_exact")), 4).alias("err_p50"),
            "p95_sampled",
            "p95_exact",
            rnd(F.abs(F.col("p95_sampled") - F.col("p95_exact")), 4).alias("err_p95"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "sketch_kmv_distinct": sketch_kmv_distinct,
    "sketch_kmv_union": sketch_kmv_union,
    "sketch_hll_estimate": sketch_hll_estimate,
    "sketch_hll_windowed": sketch_hll_windowed,
    "sketch_cms_heavy_hitters": sketch_cms_heavy_hitters,
    "sketch_sampled_quantiles": sketch_sampled_quantiles,
    "sketch_theta_intersect": sketch_theta_intersect,
    "sketch_topn_sample_quantiles": sketch_topn_sample_quantiles,
    "sketch_hll_union": sketch_hll_union,
    "sketch_bloom_semijoin": sketch_bloom_semijoin,
    "sketch_join_cardinality": sketch_join_cardinality,
    "sketch_join_plan": sketch_join_plan,
}

_H32 = md5_h32_sql("CAST(o_custkey AS VARCHAR)")
_RND4 = "FLOOR(({x}) * 1e4 + 0.5) / 1e4"


def _kmv_distinct_oracle() -> str:
    est = f"CASE WHEN got < {KMV_K} THEN CAST(got AS DOUBLE) ELSE ({KMV_K} - 1) * {H32_SPAN!r} / CAST(kth AS DOUBLE) END"
    return f"""
        WITH hashed AS (
            SELECT DISTINCT o_orderpriority, {_H32} AS h FROM orders
        ),
        topk AS (
            SELECT o_orderpriority, h,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
            FROM hashed
        ),
        summary AS (
            SELECT o_orderpriority, MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS got
            FROM topk WHERE rn <= {KMV_K} GROUP BY o_orderpriority
        ),
        exact AS (
            SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs
            FROM orders GROUP BY o_orderpriority
        )
        SELECT s.o_orderpriority,
               s.got AS sketch_size,
               {_RND4.format(x=est)} AS est_custs,
               e.exact_custs,
               {_RND4.format(x=f"ABS(({est}) - e.exact_custs) / e.exact_custs")} AS rel_err
        FROM summary s JOIN exact e USING (o_orderpriority)
        ORDER BY s.o_orderpriority
    """


def _kmv_union_oracle() -> str:
    est = f"CASE WHEN got < {KMV_K} THEN CAST(got AS DOUBLE) ELSE ({KMV_K} - 1) * {H32_SPAN!r} / CAST(kth AS DOUBLE) END"
    return f"""
        WITH hashed AS (
            SELECT DISTINCT o_orderpriority, {_H32} AS h FROM orders
        ),
        topk AS (
            SELECT o_orderpriority, h,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
            FROM hashed
        ),
        partials AS (
            SELECT DISTINCT h FROM topk WHERE rn <= {KMV_K}
        ),
        reranked AS (
            SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM partials
        ),
        merged AS (
            SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS got
            FROM reranked WHERE rn <= {KMV_K}
        ),
        exact AS (
            SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs FROM orders
        )
        SELECT CAST({KMV_K} AS INT) AS k,
               {_RND4.format(x=est)} AS est_custs,
               e.exact_custs,
               {_RND4.format(x=f"ABS(({est}) - e.exact_custs) / e.exact_custs")} AS rel_err
        FROM merged, exact e
    """


def _hll_est_sql() -> str:
    """The SQL twin of _hll_est_col, over a frame carrying
    (nonzero, present_sum). CAST: duckdb parses bare decimal literals
    as DECIMAL(18), which overflows in the multiplication; Spark's
    F.lit is a double. Same branch + ln form as the Spark expression
    (F.log == duckdb ln(), the text_char_entropy pairing)."""
    raw = (
        f"CAST({HLL_ALPHA!r} AS DOUBLE) * CAST({float(HLL_M)!r} AS DOUBLE) "
        f"* CAST({float(HLL_M)!r} AS DOUBLE) / "
        f"(present_sum + ({HLL_M} - nonzero))"
    )
    return (
        f"CASE WHEN nonzero < {HLL_M} AND ({raw}) <= CAST({2.5 * HLL_M!r} AS DOUBLE) "
        f"THEN CAST({float(HLL_M)!r} AS DOUBLE) * "
        f"LN(CAST({float(HLL_M)!r} AS DOUBLE) / ({HLL_M} - nonzero)) "
        f"ELSE ({raw}) END"
    )


def _hll_oracle() -> str:
    h = md5_h32_sql("CAST(l_partkey AS VARCHAR)")
    rho = hll_rho_sql(f"(h % {1 << HLL_W_BITS})")
    est = _hll_est_sql()
    return f"""
        WITH hashed AS (
            SELECT {h} AS h FROM lineitem
        ),
        regs AS (
            SELECT h // {1 << HLL_W_BITS} AS idx, MAX({rho}) AS M
            FROM hashed GROUP BY idx
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nonzero,
                   SUM(POWER(2.0, -M)) AS present_sum
            FROM regs
        ),
        exact AS (
            SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts FROM lineitem
        )
        SELECT CAST({HLL_M} AS INT) AS m,
               s.nonzero AS regs_nonzero,
               {_RND4.format(x=est)} AS est_parts,
               e.exact_parts,
               {_RND4.format(x=f"ABS(({est}) - e.exact_parts) / e.exact_parts")} AS rel_err
        FROM sums s, exact e
    """


def _hll_windowed_oracle() -> str:
    h = md5_h32_sql("CAST(user_id AS VARCHAR)")
    rho = hll_rho_sql(f"(h % {1 << HLL_W_BITS})")
    est = _hll_est_sql()
    return f"""
        WITH hashed AS (
            SELECT date_trunc('day', ts) AS day, {h} AS h FROM events
        ),
        regs AS (
            SELECT day, h // {1 << HLL_W_BITS} AS idx, MAX({rho}) AS M
            FROM hashed GROUP BY day, idx
        ),
        sums AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS nonzero,
                   SUM(POWER(2.0, -M)) AS present_sum
            FROM regs GROUP BY day
        ),
        exact AS (
            SELECT date_trunc('day', ts) AS day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
            FROM events GROUP BY 1
        )
        SELECT s.day,
               s.nonzero AS regs_nonzero,
               {_RND4.format(x=est)} AS est_users,
               e.exact_users,
               {_RND4.format(x=f"ABS(({est}) - e.exact_users) / e.exact_users")} AS rel_err
        FROM sums s JOIN exact e USING (day)
        ORDER BY s.day
    """


def _cms_oracle() -> str:
    key = "CAST(l_suppkey AS VARCHAR)"
    rows = "\n            UNION ALL ".join(
        f"SELECT l_suppkey, {r} AS r, {cms_bucket_sql(key, r, CMS_WIDTH)} AS bucket FROM lineitem"
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
            SELECT DISTINCT l_suppkey, r, bucket FROM keyed
        ),
        est AS (
            SELECT p.l_suppkey, MIN(c.cnt) AS est_rows
            FROM probes p JOIN counters c USING (r, bucket)
            GROUP BY p.l_suppkey
        ),
        exact AS (
            SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS exact_rows
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT e.l_suppkey, e.est_rows, x.exact_rows,
               e.est_rows - x.exact_rows AS overcount
        FROM est e JOIN exact x USING (l_suppkey)
        ORDER BY e.est_rows DESC, e.l_suppkey ASC
        LIMIT {CMS_TOP}
    """


def _sampled_quantiles_oracle() -> str:
    h = md5_h32_sql("CAST(event_id AS VARCHAR)")
    return f"""
        WITH s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_sampled,
                   FLOOR(quantile_cont(value, 0.5) * 1e4 + 0.5) / 1e4 AS p50_sampled,
                   FLOOR(quantile_cont(value, 0.95) * 1e4 + 0.5) / 1e4 AS p95_sampled
            FROM events WHERE {h} % {SAMPLE_MOD} = 0
            GROUP BY event_type
        ),
        e AS (
            SELECT event_type,
                   FLOOR(quantile_cont(value, 0.5) * 1e4 + 0.5) / 1e4 AS p50_exact,
                   FLOOR(quantile_cont(value, 0.95) * 1e4 + 0.5) / 1e4 AS p95_exact
            FROM events GROUP BY event_type
        )
        SELECT s.event_type, s.n_sampled,
               s.p50_sampled, e.p50_exact,
               FLOOR(ABS(s.p50_sampled - e.p50_exact) * 1e4 + 0.5) / 1e4 AS err_p50,
               s.p95_sampled, e.p95_exact,
               FLOOR(ABS(s.p95_sampled - e.p95_exact) * 1e4 + 0.5) / 1e4 AS err_p95
        FROM s JOIN e USING (event_type)
        ORDER BY s.event_type
    """


def _theta_intersect_oracle() -> str:
    span = f"CAST({H32_SPAN!r} AS DOUBLE)"
    th_of = (
        f"CASE WHEN COUNT(*) < {KMV_K} THEN {span} "
        f"ELSE CAST(MAX(h) AS DOUBLE) END"
    )
    est_i = f"ni.n_inter * {span} / p.th"
    est_d = f"nd.n_diff_ab * {span} / p.th"
    return f"""
        WITH hashed AS (
            SELECT DISTINCT o_orderpriority, {_H32} AS h FROM orders
            WHERE o_orderpriority IN ('{THETA_A}', '{THETA_B}')
        ),
        topk AS (
            SELECT o_orderpriority, h,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
            FROM hashed
        ),
        sa AS (SELECT h FROM topk WHERE o_orderpriority = '{THETA_A}' AND rn <= {KMV_K}),
        sb AS (SELECT h FROM topk WHERE o_orderpriority = '{THETA_B}' AND rn <= {KMV_K}),
        st AS (SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM sa) AS got_a,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM sb) AS got_b,
            (SELECT {th_of} FROM sa) AS tha,
            (SELECT {th_of} FROM sb) AS thb),
        pair AS (SELECT got_a, got_b, LEAST(tha, thb) AS th FROM st),
        ni AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_inter
            FROM sa JOIN sb USING (h), pair WHERE CAST(h AS DOUBLE) < pair.th
        ),
        nd AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_diff_ab
            FROM sa, pair
            WHERE CAST(h AS DOUBLE) < pair.th AND h NOT IN (SELECT h FROM sb)
        ),
        ex AS (
            SELECT CAST(SUM(ha * hb) AS BIGINT) AS exact_inter,
                   CAST(SUM(ha * (1 - hb)) AS BIGINT) AS exact_diff_ab
            FROM (
                SELECT o_custkey,
                       MAX(CASE WHEN o_orderpriority = '{THETA_A}' THEN 1 ELSE 0 END) AS ha,
                       MAX(CASE WHEN o_orderpriority = '{THETA_B}' THEN 1 ELSE 0 END) AS hb
                FROM orders
                WHERE o_orderpriority IN ('{THETA_A}', '{THETA_B}')
                GROUP BY o_custkey
            )
        )
        SELECT CAST({KMV_K} AS INT) AS k, p.got_a, p.got_b,
               ni.n_inter,
               {_RND4.format(x=est_i)} AS est_inter,
               ex.exact_inter,
               {_RND4.format(x=f"ABS(({est_i}) - ex.exact_inter) / ex.exact_inter")} AS rel_err_inter,
               nd.n_diff_ab,
               {_RND4.format(x=est_d)} AS est_diff_ab,
               ex.exact_diff_ab,
               {_RND4.format(x=f"ABS(({est_d}) - ex.exact_diff_ab) / ex.exact_diff_ab")} AS rel_err_diff
        FROM pair p, ni, nd, ex
    """


def _topn_sample_quantiles_oracle() -> str:
    h = md5_h32_sql("CAST(event_id AS VARCHAR)")
    return f"""
        WITH keyed AS (
            SELECT event_type, {h} AS h, value AS v FROM events
        ),
        rk AS (
            SELECT event_type, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, v) AS rn
            FROM keyed
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_sampled,
                   FLOOR(quantile_cont(v, 0.5) * 1e4 + 0.5) / 1e4 AS p50_sampled,
                   FLOOR(quantile_cont(v, 0.95) * 1e4 + 0.5) / 1e4 AS p95_sampled
            FROM rk WHERE rn <= {TOPN_N}
            GROUP BY event_type
        ),
        e AS (
            SELECT event_type,
                   FLOOR(quantile_cont(value, 0.5) * 1e4 + 0.5) / 1e4 AS p50_exact,
                   FLOOR(quantile_cont(value, 0.95) * 1e4 + 0.5) / 1e4 AS p95_exact
            FROM events GROUP BY event_type
        )
        SELECT s.event_type, s.n_sampled,
               s.p50_sampled, e.p50_exact,
               FLOOR(ABS(s.p50_sampled - e.p50_exact) * 1e4 + 0.5) / 1e4 AS err_p50,
               s.p95_sampled, e.p95_exact,
               FLOOR(ABS(s.p95_sampled - e.p95_exact) * 1e4 + 0.5) / 1e4 AS err_p95
        FROM s JOIN e USING (event_type)
        ORDER BY s.event_type
    """


def _hll_union_oracle() -> str:
    h = md5_h32_sql("CAST(user_id AS VARCHAR)")
    rho = hll_rho_sql(f"(h % {1 << HLL_W_BITS})")
    est = _hll_est_sql()
    return f"""
        WITH hashed AS (
            SELECT date_trunc('day', ts) AS day, {h} AS h FROM events
        ),
        prepared AS (
            SELECT day,
                   h // {1 << HLL_W_BITS} AS idx,
                   {rho} AS rho
            FROM hashed
        ),
        daily AS (
            SELECT day, idx, MAX(rho) AS M FROM prepared GROUP BY day, idx
        ),
        merged AS (
            SELECT idx, MAX(M) AS M FROM daily GROUP BY idx
        ),
        direct AS (
            SELECT idx, MAX(rho) AS M FROM prepared GROUP BY idx
        ),
        mism AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS regs_mismatch
            FROM merged m FULL JOIN direct d USING (idx)
            WHERE m.M IS DISTINCT FROM d.M
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nonzero,
                   SUM(POWER(2.0, -M)) AS present_sum
            FROM merged
        ),
        exact AS (
            SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users FROM events
        )
        SELECT CAST({HLL_M} AS INT) AS m,
               s.nonzero AS regs_nonzero,
               mism.regs_mismatch,
               {_RND4.format(x=est)} AS est_users,
               e.exact_users,
               {_RND4.format(x=f"ABS(({est}) - e.exact_users) / e.exact_users")} AS rel_err
        FROM sums s, exact e, mism
    """


def _join_cardinality_oracle() -> str:
    h = md5_h32_sql("CAST(k AS VARCHAR)")
    span = f"CAST({H32_SPAN!r} AS DOUBLE)"
    th_of = (
        f"CASE WHEN COUNT(*) < {JOINCARD_N} THEN {span} "
        f"ELSE CAST(MAX(h) AS DOUBLE) END"
    )
    est = f"m.sum_prod * {span} / p.th"
    return f"""
        WITH a AS (
            SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem WHERE year(l_shipdate) = {JOINCARD_YEAR_A} GROUP BY 1
        ),
        b AS (
            SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem WHERE year(l_shipdate) = {JOINCARD_YEAR_B} GROUP BY 1
        ),
        ra AS (
            SELECT {h} AS h, cnt,
                   ROW_NUMBER() OVER (ORDER BY {h}, cnt) AS rn
            FROM a
        ),
        rb AS (
            SELECT {h} AS h, cnt,
                   ROW_NUMBER() OVER (ORDER BY {h}, cnt) AS rn
            FROM b
        ),
        sa AS (SELECT h, cnt FROM ra WHERE rn <= {JOINCARD_N}),
        sb AS (SELECT h, cnt FROM rb WHERE rn <= {JOINCARD_N}),
        st AS (SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM sa) AS got_a,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM sb) AS got_b,
            (SELECT {th_of} FROM sa) AS tha,
            (SELECT {th_of} FROM sb) AS thb),
        p AS (SELECT got_a, got_b, LEAST(tha, thb) AS th FROM st),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_common_sampled,
                   CAST(SUM(sa.cnt * sb.cnt) AS BIGINT) AS sum_prod
            FROM sa JOIN sb USING (h), p
            WHERE CAST(h AS DOUBLE) < p.th
        ),
        ex AS (
            SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS exact_join_rows
            FROM a JOIN b USING (k)
        )
        SELECT CAST({JOINCARD_N} AS INT) AS n, p.got_a, p.got_b,
               m.n_common_sampled,
               {_RND4.format(x=est)} AS est_join_rows,
               ex.exact_join_rows,
               {_RND4.format(x=f"ABS(({est}) - ex.exact_join_rows) / ex.exact_join_rows")} AS rel_err
        FROM p, m, ex
    """


def _join_plan_oracle() -> str:
    # the same theta-sample ratio estimator as _join_cardinality_oracle,
    # over the planner scenario's sides (orders key multiplicities vs
    # the unique-key customer slice). The strategy string is emitted as
    # the literal the in-query _require already proved the engine chose
    # (the decision arithmetic — est_bytes <= 10 MB — needs the
    # schema-derived row width, which SQL cannot re-derive; the gate
    # for the decision is the query-side _require + the plan test).
    h = md5_h32_sql("CAST(k AS VARCHAR)")
    span = f"CAST({H32_SPAN!r} AS DOUBLE)"
    th_of = (
        f"CASE WHEN COUNT(*) < {JOINCARD_N} THEN {span} "
        f"ELSE CAST(MAX(h) AS DOUBLE) END"
    )
    est = f"COALESCE(m.sum_prod, 0) * {span} / p.th"
    return f"""
        WITH a AS (
            SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM orders GROUP BY 1
        ),
        b AS (
            SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM customer WHERE c_acctbal > {BLOOM_ACCTBAL_MIN!r} GROUP BY 1
        ),
        ra AS (
            SELECT {h} AS h, cnt,
                   ROW_NUMBER() OVER (ORDER BY {h}, cnt) AS rn
            FROM a
        ),
        rb AS (
            SELECT {h} AS h, cnt,
                   ROW_NUMBER() OVER (ORDER BY {h}, cnt) AS rn
            FROM b
        ),
        sa AS (SELECT h, cnt FROM ra WHERE rn <= {JOINCARD_N}),
        sb AS (SELECT h, cnt FROM rb WHERE rn <= {JOINCARD_N}),
        st AS (SELECT
            (SELECT {th_of} FROM sa) AS tha,
            (SELECT {th_of} FROM sb) AS thb),
        p AS (SELECT LEAST(tha, thb) AS th FROM st),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_common_sampled,
                   CAST(SUM(sa.cnt * sb.cnt) AS BIGINT) AS sum_prod
            FROM sa JOIN sb USING (h), p
            WHERE CAST(h AS DOUBLE) < p.th
        ),
        rows_f AS (SELECT CAST(COUNT(*) AS BIGINT) AS rows_fact FROM orders),
        rows_d AS (SELECT CAST(COUNT(*) AS BIGINT) AS rows_dim FROM b),
        ex AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_rows
            FROM orders o JOIN b ON o.o_custkey = b.k
        )
        SELECT CAST({JOINCARD_N} AS INT) AS n,
               rows_f.rows_fact, rows_d.rows_dim,
               m.n_common_sampled,
               {_RND4.format(x=est)} AS est_join_rows,
               ex.exact_join_rows,
               'broadcast_right' AS strategy
        FROM rows_f, rows_d, ex, m, p
    """


def _bloom_semijoin_oracle() -> str:
    from quack_reduce_spark.operators.sketches import (
        BLOOM_BITS_PER_KEY,
        BLOOM_SIZED_K,
        BLOOM_WORD_BITS,
    )

    salt_values = ", ".join(
        f"({r}, {(r * r * r - r) // 6})" for r in range(BLOOM_SIZED_K)
    )
    # m derived from the key count with PURE INTEGER arithmetic —
    # the exact formula bloom_size() uses, so both engines land on
    # the identical bitset width from their own COUNT(*). Positions
    # replay Kirsch-Mitzenmacher double hashing exactly as
    # operators.sketches.bloom_positions computes them: h1/h2 are the
    # two 32-bit md5 halves (h2 forced odd), g_i = (h1 + i*h2 +
    # (i^3-i)/6) mod m — the Dillinger-Manolios cubic constant rides
    # in the salts VALUES list, precomputed per probe index.
    return f"""
        WITH keys AS (
            SELECT DISTINCT c_custkey AS k FROM customer
            WHERE c_acctbal > {BLOOM_ACCTBAL_MIN!r}
        ),
        msz AS (
            SELECT ((COUNT(*) * {BLOOM_BITS_PER_KEY} + {BLOOM_WORD_BITS - 1})
                    // {BLOOM_WORD_BITS}) * {BLOOM_WORD_BITS} AS m
            FROM keys
        ),
        salts AS (SELECT * FROM (VALUES {salt_values}) t(i, c)),
        khash AS (
            SELECT k,
                   CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8)
                        AS BIGINT) AS h1,
                   CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 9, 8)
                        AS BIGINT) | 1 AS h2
            FROM keys
        ),
        pos AS (
            SELECT k, (h1 + i * h2 + c) % (SELECT m FROM msz) AS p
            FROM khash, salts
        ),
        words AS (
            SELECT p // {BLOOM_WORD_BITS} AS word_idx,
                   BIT_OR(CAST(1 AS BIGINT) << CAST(p % {BLOOM_WORD_BITS} AS INT)) AS word
            FROM pos GROUP BY 1
        ),
        fhash AS (
            SELECT o_orderkey, o_custkey,
                   CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
                        AS BIGINT) AS h1,
                   CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 9, 8)
                        AS BIGINT) | 1 AS h2
            FROM orders
        ),
        fpos AS (
            SELECT o_orderkey, o_custkey,
                   (h1 + i * h2 + c) % (SELECT m FROM msz) AS p
            FROM fhash, salts
        ),
        fhit AS (
            SELECT o_orderkey, o_custkey,
                   COUNT(*) FILTER (
                       w.word IS NOT NULL
                       AND ((w.word >> CAST(p % {BLOOM_WORD_BITS} AS INT)) & 1) = 1
                   ) AS hits
            FROM fpos LEFT JOIN words w ON fpos.p // {BLOOM_WORD_BITS} = w.word_idx
            GROUP BY o_orderkey, o_custkey
        ),
        flag AS (
            SELECT (hits = {BLOOM_SIZED_K}) AS bp,
                   (o_custkey IN (SELECT k FROM keys)) AS mem
            FROM fhit
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
                   CAST(COUNT(*) FILTER (bp) AS BIGINT) AS n_bloom_pass,
                   CAST(COUNT(*) FILTER (mem) AS BIGINT) AS n_exact,
                   CAST(COUNT(*) FILTER (bp AND NOT mem) AS BIGINT) AS n_false_pos,
                   CAST(COUNT(*) FILTER (NOT bp AND mem) AS BIGINT) AS n_missed
            FROM flag
        ),
        nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys FROM keys)
        SELECT CAST(msz.m AS BIGINT) AS m_bits,
               CAST({BLOOM_SIZED_K} AS INT) AS k,
               nk.n_keys, a.n_fact, a.n_bloom_pass, a.n_exact,
               a.n_false_pos, a.n_missed,
               {_RND4.format(x="a.n_false_pos / (a.n_fact - a.n_exact)")} AS fp_rate
        FROM agg a, nk, msz
    """


ORACLES = {
    "sketch_kmv_distinct": _kmv_distinct_oracle(),
    "sketch_kmv_union": _kmv_union_oracle(),
    "sketch_hll_estimate": _hll_oracle(),
    "sketch_hll_windowed": _hll_windowed_oracle(),
    "sketch_cms_heavy_hitters": _cms_oracle(),
    "sketch_sampled_quantiles": _sampled_quantiles_oracle(),
    "sketch_theta_intersect": _theta_intersect_oracle(),
    "sketch_topn_sample_quantiles": _topn_sample_quantiles_oracle(),
    "sketch_hll_union": _hll_union_oracle(),
    "sketch_bloom_semijoin": _bloom_semijoin_oracle(),
    "sketch_join_cardinality": _join_cardinality_oracle(),
    "sketch_join_plan": _join_plan_oracle(),
}
