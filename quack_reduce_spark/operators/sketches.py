"""Portable mergeable cardinality/frequency sketches (KMV, HLL,
count-min) built from deterministic md5 arithmetic.

THE 100 TB pattern for distinct-counting and heavy-hitters is a
mergeable fixed-size sketch: each partition folds its rows into a
bounded summary (k hash values / 2^p registers / d*w counters),
partials merge associatively in the map-side combine, and the final
answer never shuffles more than the sketch. Spark ships engine-native
versions (approx_count_distinct = HLL++, approx_percentile) — those
are the production defaults and are covered rows-only in
inventory/approx.py, because their register internals are
engine-specific. THIS module is the differential-verification path:
the same sketch mathematics expressed in the engine-portable md5
family (the `conv(substring(md5(k),1,8),16,10)` 32-bit hash every
ml_* query uses), so a DuckDB oracle replays register-for-register
and the driver hash-gates the whole estimate, not just a row count.

Sketch math is public-textbook material: KMV/theta (Bar-Yossef et al.
"Counting distinct elements in a data stream"; Dasgupta et al., the
DataSketches theta formulation), HLL (Flajolet et al. 2007), count-min
(Cormode & Muthukrishnan 2005). The reference engine exposes none of
these (DuckDB's approx_count_distinct is its own HLL) — this family is
part of the beyond-reference training-data-pipeline layer.

Scale discipline: every builder here is ONE groupBy over a hashed
projection (map-side combinable) plus joins that touch only
sketch-sized frames. The KMV "k smallest per group" uses a rank
window over the hashed DISTINCT frame — at true 100 TB you would cap
per-partition candidates first (any h beyond a partition's k-th
smallest can never enter the global top-k); the window form keeps the
fixture-scale plan simple and the oracle replay exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

H32_SPAN = 4294967296.0  # 2^32 as an exact double

# HLL parameters: p=8 -> m=256 registers, 24-bit rho domain
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_W_BITS = 32 - HLL_P
# Flajolet's bias correction alpha_m for m >= 128
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def md5_h32(col: Column) -> Column:
    """First 32 bits of md5 as an unsigned value in a long — the
    engine-portable uniform hash (DuckDB:
    ``CAST('0x'||substring(md5(x),1,8) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_h32_sql(key_sql: str) -> str:
    return f"CAST('0x' || substring(md5({key_sql}), 1, 8) AS BIGINT)"


def kmv_per_group(
    hashed: DataFrame, group_col: str, k: int, fanout: int | str = "auto"
) -> DataFrame:
    """Per-group KMV summary from a ``(group_col, h)`` DISTINCT-hash
    frame: ``(group_col, kth, got)`` where ``kth`` is the k-th
    smallest hash and ``got`` = min(k, distinct hashes). Estimate =
    (k-1) * 2^32 / kth when the sketch filled, else ``got`` exactly
    (fewer distinct values than k means the sketch IS the exact set).

    Two-level tree shape (r8): level 1 takes each (group, h%fanout)
    salt bucket's k smallest (sorted-list slice, partial-aggregated
    per partition by ObjectHashAggregate); level 2 re-takes k smallest
    of the <= fanout*k survivors per group. Output is PROVABLY
    identical to a single per-group sort — every global top-k hash is
    necessarily in its own salt bucket's top-k (the same merge theorem
    the theta-union query demonstrates) — while no single aggregation
    ever sorts more than max(|distinct|/fanout, fanout*k) values,
    which is what survives a billion-key group at 100 TB where a
    per-group row_number window would funnel the whole group through
    one sort. tests/test_sketches.py asserts tree == windowed-sort
    equality at several fanouts including adaptive.

    ``fanout="auto"`` (r9 default) sizes the fanout PER GROUP from the
    group's hash count: fanout_g = ceil(sqrt(n_g / k)), the value that
    BALANCES the two levels (level 1 holds ~n/fanout, level 2 holds
    fanout*k; both become ~sqrt(n*k)). A fixed fanout leaves one level
    unbounded in the group cardinality: 64 gives a 16M-value level-1
    bucket at a billion distinct keys, while sqrt(1e9*64) ~= 250k is
    the balanced bound. Fanout only shapes the plan — the theorem
    makes the output identical at ANY fanout, so oracle hashes never
    move.
    """
    return kmv_topk_lists(hashed, group_col, k, fanout).select(
        group_col,
        F.element_at("__tk", F.array_size("__tk")).alias("kth"),
        F.array_size("__tk").cast("long").alias("got"),
    )


def adaptive_fanout(n: Column, k: int) -> Column:
    """The balanced per-group salt fanout: ceil(sqrt(n/k)), >= 1.
    Exposed so tests can pin the bucket-size bound independently."""
    return F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.sqrt(n.cast("double") / F.lit(float(k)))).cast("long"),
    )


def kmv_topk_lists(
    hashed: DataFrame, group_col: str, k: int, fanout: int | str = "auto"
) -> DataFrame:
    """(group_col, __tk): each group's k smallest hashes as a sorted
    array, built by the two-level salt tree described in
    :func:`kmv_per_group`. The LIST form is the mergeable sketch
    itself — union several groups' lists and re-slice to merge
    (sketch_kmv_union does exactly that).

    With ``fanout="auto"`` the per-group fanout comes from a map-side-
    combinable COUNT over the hash frame (the frame is distinct, so
    count == cardinality — no estimator error), broadcast-joined back.
    The count shuffle moves one long per (partition, group); the
    broadcast holds one row per group. When the GROUP count itself is
    too large to broadcast, per-group cardinalities are necessarily
    small and a fixed fanout (or fanout=1) is the right call — pass an
    int to skip the count pass entirely."""
    if fanout == "auto":
        fans = hashed.groupBy(group_col).agg(
            adaptive_fanout(F.count(F.lit(1)), k).alias("__fan")
        )
        salted = hashed.join(F.broadcast(fans), group_col).select(
            group_col, "h", F.pmod(F.col("h"), F.col("__fan")).alias("__salt")
        )
    else:
        salted = hashed.select(
            group_col, "h", F.pmod(F.col("h"), F.lit(fanout)).alias("__salt")
        )
    lvl1 = salted.groupBy(group_col, "__salt").agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("__tk")
    )
    survivors = lvl1.select(group_col, F.explode("__tk").alias("h"))
    return survivors.groupBy(group_col).agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("__tk")
    )


def topn_sample_lists(
    keyed: DataFrame, group_col: str, n: int, fanout: int | str = "auto"
) -> DataFrame:
    """(group_col, __smp): each group's ``n`` rows with the SMALLEST
    hashes as a sorted ``array<struct<h,v>>`` — the fixed-SIZE
    mergeable per-group sample (bottom-n hash sample). Where
    sketch_sampled_quantiles' fixed-RATE sample grows linearly with
    the data, this is the bounded-memory form: exactly ``n`` rows per
    group survive no matter the group size, and two samples merge by
    union + re-sort + re-slice — the same prefix-of-a-sorted-union
    theorem as KMV, so the tree (reused from :func:`kmv_topk_lists`,
    generalized to carry a payload ``v``) is provably equal to a
    per-group ROW_NUMBER sort at any fanout. Ties on ``h`` order by
    ``v`` (struct sort is field-lexicographic), giving a total order
    any engine replays."""
    if fanout == "auto":
        fans = keyed.groupBy(group_col).agg(
            adaptive_fanout(F.count(F.lit(1)), n).alias("__fan")
        )
        salted = keyed.join(F.broadcast(fans), group_col).select(
            group_col, "h", "v", F.pmod(F.col("h"), F.col("__fan")).alias("__salt")
        )
    else:
        salted = keyed.select(
            group_col, "h", "v", F.pmod(F.col("h"), F.lit(fanout)).alias("__salt")
        )
    lvl1 = salted.groupBy(group_col, "__salt").agg(
        F.slice(F.array_sort(F.collect_list(F.struct("h", "v"))), 1, n).alias("__smp")
    )
    survivors = lvl1.select(group_col, F.explode("__smp").alias("__s")).select(
        group_col, F.col("__s.h").alias("h"), F.col("__s.v").alias("v")
    )
    return survivors.groupBy(group_col).agg(
        F.slice(F.array_sort(F.collect_list(F.struct("h", "v"))), 1, n).alias("__smp")
    )


def kmv_estimate(kth: Column, got: Column, k: int) -> Column:
    """The KMV estimator over a :func:`kmv_per_group` summary."""
    return F.when(got < k, got.cast("double")).otherwise(
        (k - 1) * F.lit(H32_SPAN) / kth.cast("double")
    )


def key_count_sample(df: DataFrame, key_col: str, n: int) -> DataFrame:
    """One-row frame (``__smp``): the bottom-``n`` hash sample of
    ``df``'s key MULTIPLICITIES — fold to (key, count), hash the key,
    keep the ``n`` smallest hashes carrying their counts (the
    :func:`topn_sample_lists` tree). Below its theta the sample is an
    exact (key -> count) record of the side; it is the payload-carrying
    theta sketch a planner ships around at 100 TB (one bounded array
    per table/column, mergeable by union+reslice)."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return key_count_sample_from_counts(counts, n)


def key_count_sample_from_counts(counts: DataFrame, n: int) -> DataFrame:
    """:func:`key_count_sample` from an ALREADY-AGGREGATED
    ``(k, cnt)`` frame — for callers that also need the per-key counts
    themselves (e.g. an exact join-size aggregate next to the
    estimate): share one groupBy instead of folding the fact twice."""
    keyed = counts.select(
        F.lit("g").alias("g"),
        md5_h32(F.col("k").cast("string")).alias("h"),
        F.col("cnt").alias("v"),
    )
    return topn_sample_lists(keyed, "g", n).select("__smp")


def sample_theta(arr: Column, n: int) -> Column:
    """Theta of a bottom-``n`` sample array: the n-th smallest hash
    (as double), or the full 2^32 span when the sample never filled
    (every key is in it — the exact regime)."""
    return F.when(F.array_size(arr) < n, F.lit(H32_SPAN)).otherwise(
        F.element_at(arr, F.array_size(arr))["h"].cast("double")
    )


def join_rows_estimate(sa: DataFrame, sb: DataFrame, n: int) -> DataFrame:
    """|A ⋈ B| estimate from two :func:`key_count_sample` rows: the
    theta-sketch ratio estimator over key multiplicities —
    sum(cntA·cntB) across hash-matched sampled keys below
    min(theta_A, theta_B), scaled by span/theta. Exact when neither
    sample filled (theta = span, every key sampled). One row out:
    (got_a, got_b, th, n_common_sampled, sum_prod, est_join_rows).
    All arithmetic runs on two <= n-struct arrays — the crossJoin is
    1x1 by construction."""
    pair = (
        sa.select(F.col("__smp").alias("smp_a"))
        .crossJoin(sb.select(F.col("__smp").alias("smp_b")))  # 1x1: sketch rows
        .select(
            "smp_a",
            "smp_b",
            F.array_size("smp_a").cast("long").alias("got_a"),
            F.array_size("smp_b").cast("long").alias("got_b"),
            F.least(
                sample_theta(F.col("smp_a"), n), sample_theta(F.col("smp_b"), n)
            ).alias("th"),
        )
        .localCheckpoint(eager=False)
    )
    ea = pair.select("th", F.explode("smp_a").alias("s")).select(
        "th", F.col("s.h").alias("h"), F.col("s.v").alias("va")
    )
    eb = pair.select(F.explode("smp_b").alias("s")).select(
        F.col("s.h").alias("h"), F.col("s.v").alias("vb")
    )
    matched = (
        ea.join(eb, "h")
        .filter(F.col("h").cast("double") < F.col("th"))
        .agg(
            F.count(F.lit(1)).alias("n_common_sampled"),
            F.sum(F.col("va") * F.col("vb")).cast("long").alias("sum_prod"),
        )
    )
    est = (
        F.coalesce(F.col("sum_prod"), F.lit(0)) * F.lit(H32_SPAN) / F.col("th")
    )
    return (
        pair.select("got_a", "got_b", "th")
        .crossJoin(matched)  # 1x1 again
        .select(
            "got_a",
            "got_b",
            "th",
            "n_common_sampled",
            "sum_prod",
            est.alias("est_join_rows"),
        )
    )


def hll_rho(w: Column) -> Column:
    """Position of the first 1-bit (from the MSB of the 24-bit
    window), 1-based; 25 for w == 0 — pure comparison ladder so any
    engine replays it exactly (no log2: float logs are libm-dependent
    at exact powers of two)."""
    expr = F.lit(HLL_W_BITS + 1)  # w == 0
    # w in [2^(b-1), 2^b) -> bit_length b -> rho = W_BITS - b + 1
    for b in range(1, HLL_W_BITS + 1):
        expr = F.when(w >= (1 << (b - 1)), F.lit(HLL_W_BITS - b + 1)).otherwise(expr)
    return expr


def hll_rho_sql(w_sql: str) -> str:
    """The same ladder as DuckDB-runnable SQL (descending WHENs: the
    first matching branch wins, mirroring the Spark expression where
    the LAST constructed .when — the largest bound — dominates)."""
    cases = " ".join(
        f"WHEN {w_sql} >= {1 << (b - 1)} THEN {HLL_W_BITS - b + 1}"
        for b in range(HLL_W_BITS, 0, -1)
    )
    return f"CASE {cases} ELSE {HLL_W_BITS + 1} END"


def hll_registers(hashed: DataFrame) -> DataFrame:
    """(idx, M) register table from a 1-column ``h`` frame: idx = top
    p bits, M = max rho over the low bits. max() is idempotent, so no
    distinct pass is needed and partials merge map-side — the whole
    sketch is one fixed-width aggregate."""
    return (
        hashed.select(
            F.shiftrightunsigned(F.col("h"), HLL_W_BITS).alias("idx"),
            hll_rho(F.col("h").bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))).alias("rho"),
        )
        .groupBy("idx")
        .agg(F.max("rho").alias("M"))
    )


# Bloom filter: m = WORDS * WORD_BITS bits in long words; 62 bits per
# word keeps every shift value positive under ANSI int64 (1 << 61 max).
# BLOOM_WORDS/BLOOM_M/BLOOM_K are the fixed-width DEFAULTS (a bounded
# demo sketch); production filters are SIZED from the key count via
# bloom_size() — a fixed-m filter silently saturates (fp -> 1) once
# n_keys grows past ~m/10 (the round-9 design nit this fixes).
BLOOM_WORDS = 132
BLOOM_WORD_BITS = 62
BLOOM_M = BLOOM_WORDS * BLOOM_WORD_BITS  # 8184 bits
BLOOM_K = 3

# Sized-filter constants for a ~1% target fp rate: the textbook
# optimum is m/n = -ln(p)/ln^2(2) = 9.585 bits/key at p = 0.01,
# rounded UP to the integer 10 so m derives from n with PURE INTEGER
# arithmetic (exactly replayable in any SQL engine — no cross-libm
# float drift; see docs: round-8 log2 lesson), and k = round((m/n)
# ln 2) = 7, giving fp ~= (1 - e^(-7/10*ln-ish))... ~= 0.008 < 1%.
BLOOM_BITS_PER_KEY = 10
BLOOM_SIZED_K = 7


def bloom_size(n_keys: int) -> tuple[int, int]:
    """(words, m_bits) sized for ``n_keys`` at ~1% false positives:
    ``m = ceil(n * BITS_PER_KEY / WORD_BITS) * WORD_BITS`` — integer
    math only, so an oracle SQL computing the same formula from its
    own COUNT(*) lands on the identical m."""
    n = max(1, int(n_keys))
    words = (n * BLOOM_BITS_PER_KEY + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS
    return words, words * BLOOM_WORD_BITS


def bloom_positions(key: Column, m: int = BLOOM_M, k: int = BLOOM_K) -> list[Column]:
    """``k`` bit positions for a key via ENHANCED double hashing
    (Kirsch–Mitzenmacher with the Dillinger–Manolios cubic term):
    ``g_i = (h1 + i*h2 + (i^3 - i)/6) mod m`` where h1/h2 are the two
    32-bit halves of ONE md5 (h2 forced odd so the probe stride is
    never degenerate) and the cubic term is a compile-time constant
    per probe. One md5 per probed row instead of ``k`` independent
    salted md5s — the round-10 bench regression lever (k=7 md5 calls
    per fact row) — with the KM theorem's guarantee that the
    false-positive asymptotics match k independent hashes; the cubic
    term removes plain-KM's small-m probe-set collisions (measured
    ~4x fp at m~200 bits without it). Spark's whole-stage codegen
    eliminates the repeated md5/conv subexpressions, so the per-row
    cost is one digest + k modular adds. Max value under
    2^32 * (k+1) + k^3: safely inside ANSI int64 for any practical
    k."""
    digest = F.md5(key)
    h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").bitwiseOR(
        F.lit(1)
    )
    return [
        (h1 + F.lit(i) * h2 + F.lit((i * i * i - i) // 6)) % m for i in range(k)
    ]


def bloom_words(
    keys: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """(word_idx, word): the Bloom bitset of a key frame as
    ``m / 62`` long words — ONE map-side-combinable aggregate (bit_or
    is associative/commutative/idempotent, so partial bitsets merge
    exactly like HLL registers; union of key sets == bitwise OR of
    their word frames, tested in tests/test_sketches.py). Width is
    fixed by ``m`` regardless of key count — the shippable semi-join
    pre-filter every engine pushes into scans at 100 TB (Spark's own
    AQE runtime bloom join is the engine-native analogue; this is the
    engine-portable, DuckDB-replayable form). Size ``m`` from the
    expected key count with :func:`bloom_size`."""
    pos = keys.select(
        F.explode(
            F.array(*bloom_positions(F.col(key_col).cast("string"), m=m, k=k))
        ).alias("p")
    )
    return (
        pos.select(
            F.floor(F.col("p") / BLOOM_WORD_BITS).cast("long").alias("word_idx"),
            _bit_of(F.col("p")).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


# r17 REJECTED experiment (measured, reverted — numbers as deterrent):
# a fully-fused ``bloom_words_sized`` that computed the key COUNT and
# the bitset in ONE action by deriving m AS A COLUMN from a crossJoined
# one-row count (the sizing formula is integer arithmetic, so ``% m``
# of a column builds identical bits — verified bit-equal + oracle-green
# before timing). Paired fresh-process A/B on sketch_bloom_semijoin at
# sf0.1: ctrl mins 1.716/1.469 vs fused 1.881/1.933 (+15-25%) — the
# broadcast-count crossJoin inside the build job costs more than the
# one tiny count job it saves (the count on the persisted key set is
# ~50 ms). The shipped shape: persist keys, count() (one action that
# materializes AND sizes), then the literal-m bitset collect reads the
# cache — one driver action fewer than the r16 shape at a measured
# wash (1.711 vs 1.717, 1.871 vs 1.802).


def _bit_of(p: Column) -> Column:
    """``1 << (p % WORD_BITS)`` via a literal power-of-two array lookup
    (F.shiftleft only takes a Python-int bit count, not a Column)."""
    powers = F.array(
        *[F.lit(1 << i).cast("long") for i in range(BLOOM_WORD_BITS)]
    )
    return F.element_at(powers, ((p % BLOOM_WORD_BITS) + 1).cast("int"))


# Above this many 62-bit words the bitset stops riding in the plan as
# a literal array — the array expression is REPLICATED once per probe
# (k times) in the tree, so analysis/codegen cost grows k x words and
# a sized filter's bitset grows O(n_keys) on top — and ships as
# broadcast DATA instead (one torrent transfer per executor, zero plan
# growth). 128 words (~1 KB / ~800 keys) is the measured crossover
# region: at 225 words the broadcast path already beats the literal by
# ~0.2 s/call of saved plan work (sf0.1, local[32]); below ~100 words
# the single-row broadcast join's extra stage isn't worth it.
BLOOM_LITERAL_MAX_WORDS = 128


def _bloom_cond(arr: Column, m: int, key: Column, k: int) -> Column:
    """Membership test of ``key`` against a bitset held in ``arr`` (an
    array<long> expression — literal or column), all k probes must
    hit. The bit test is ``getbit(word, p % 62)`` — a column-position
    bit probe, not the 62-literal power-of-two lookup the BUILD side
    uses to construct words — so the probe expression tree stays small
    (plan analysis cost is tree-size-proportional and this expression
    is replicated k times)."""
    cond = F.lit(True)
    for p in bloom_positions(key, m=m, k=k):
        word = F.element_at(arr, (F.floor(p / BLOOM_WORD_BITS) + 1).cast("int"))
        cond = cond & (F.getbit(word, (p % BLOOM_WORD_BITS).cast("int")) == 1)
    return cond


def bloom_pass_expr(words: list[int], key: Column, k: int = BLOOM_K) -> Column:
    """Row-local membership test against a DRIVER-MATERIALIZED bitset
    (``words``: the dense m/62-long array; m is implied by its
    length), shipped into the scan as a literal-array expression —
    zero joins, zero shuffle on the probe side, pure whole-stage
    codegen. Appropriate while the bitset is SMALL (demo-width
    filters, or sized filters under :data:`BLOOM_LITERAL_MAX_WORDS`);
    a sized filter's bitset grows with the key count, so the
    production entry point is :func:`bloom_filter_frame`, which picks
    the literal or broadcast transport by width. No false negatives by
    construction; false positives are quantified by the caller. ``k``
    must match the ``k`` the bitset was built with."""
    m = len(words) * BLOOM_WORD_BITS
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    return _bloom_cond(arr, m, key, k)


def bloom_filter_frame(
    df,
    words: list[int],
    key: Column,
    k: int = BLOOM_K,
    pass_col: str = "bp",
    literal_max_words: int = BLOOM_LITERAL_MAX_WORDS,
) -> "DataFrame":
    """``df`` plus boolean ``pass_col`` marking rows whose ``key``
    passes the Bloom filter — the bounded-transport form. Bitsets up
    to ``literal_max_words`` embed in the plan as a literal array
    (zero joins, the runtime-filter shape); wider ones ship as a
    BROADCAST single-row frame joined in with a 1-row
    BroadcastNestedLoopJoin — the bits move as torrent-broadcast DATA,
    once per executor, and the plan string stays flat no matter how
    many keys went in (tests/test_sketches.py asserts the flatness).
    Either transport tests the identical bits: results are
    bit-for-bit equal."""
    m = len(words) * BLOOM_WORD_BITS
    if len(words) <= literal_max_words:
        return df.withColumn(pass_col, bloom_pass_expr(words, key, k=k))
    spark = df.sparkSession
    bf = spark.createDataFrame(
        [([int(w) for w in words],)], "__bloom_words array<long>"
    )
    return (
        df.crossJoin(F.broadcast(bf))
        .withColumn(pass_col, _bloom_cond(F.col("__bloom_words"), m, key, k))
        .drop("__bloom_words")
    )


def cms_buckets(key: Column, rows: int, width: int) -> Column:
    """Array of ``rows`` independent count-min bucket ids for a key —
    row r's hash family is md5 over an ``r:``-salted key."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{r}:"), key)), 1, 8), 16, 10
                ).cast("long")
                % width
            )
            for r in range(rows)
        ]
    )


def cms_bucket_sql(key_sql: str, r: int, width: int) -> str:
    return (
        f"CAST('0x' || substring(md5('{r}:' || {key_sql}), 1, 8) AS BIGINT) % {width}"
    )
