"""Deduplication operators (north-star LLM-pipeline components).

Four tiers, all shuffle-disciplined for 100 TB:

- exact_dedup: hash-groupBy on a content fingerprint — one shuffle on
  the md5 key; at scale the fingerprint is computed scan-side so only
  (fp, doc_id) pairs move.
- ngram_jaccard_pairs: word-shingle explode → self-join on shingle →
  per-pair overlap count → exact Jaccard. The shingle join is the
  classic inverted-index blocking: cost is sum over shingles of
  bucket², so rare shingles dominate and the operator stays sub-
  quadratic; a frequency cap drops stop-shingles (df > max_doc_freq)
  the way search engines drop posting lists.
- minhash_lsh_pairs: 32-permutation MinHash signatures (JVM-side
  xxhash64, no UDF) → banded LSH bucketing → candidate pairs from
  equal bands → exact-Jaccard verification of candidates only. This is
  the scale path: candidate generation is linear in corpus size.
- simhash64: 64-bit SimHash per doc from token votes (bit_count/xor
  give Hamming distance downstream); banded into 4×16-bit keys so
  Hamming<=3 candidates collide in >=1 band.

Deterministic throughout (xxhash64 + fixed affine permutations), so
results are stable across runs/partitionings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from quack_reduce_spark.functions.numeric import rnd
from quack_reduce_spark.operators.reuse import reuse_persist

# Fixed affine permutation constants for MinHash (public Carter-Wegman
# style h_i(x) = a_i*x + b_i over the 2^64 ring; odd multipliers).
_MERSENNE_A = 0x9E3779B97F4A7C15  # golden-ratio odd constant
_MERSENNE_B = 0xC2B2AE3D27D4EB4F


MINHASH_P = (1 << 31) - 1  # Mersenne prime modulus for the permutations


def _perm_consts(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic distinct (a, b) pairs, both < 2^30 and a odd.

    Each permutation is (a*h + b) % MINHASH_P over a base hash FOLDED
    TO 31 BITS (h < MINHASH_P, a,b < MINHASH_P, prime modulus — the
    classic 2-universal family; a*h < 2^61 stays comfortably inside
    signed-64 with Spark's ANSI overflow checks on).

    Two constructions that LOOK like this one are degenerate, and both
    shipped before round 7 caught fixture pairs at j=0.98 missed by
    all 8 bands:
    - no modulus at all: a > 0 makes a*h+b monotone in h, so
      min(a*h+b) = a*min(h)+b — every "permutation" selects the same
      argmin shingle and the signature is one hash repeated;
    - a modulus much larger than a*h (e.g. 2^61-1 over 32-bit h with
      a < 2^30): the product wraps AT MOST ONCE, so each permutation
      is monotone-except-one-cut — argmins stay heavily correlated
      across permutations and pair recall still collapses.
    The modulus must be comparable to the folded hash range so a*h
    wraps ~2^30 times.

    Diversity property-tested: tests/test_properties.py
    ``test_minhash_family_agreement_tracks_jaccard`` asserts
    E[component agreement] == Jaccard and its meta-test proves the
    statistic rejects both degenerate look-alikes above.
    """
    out = []
    a, b = _MERSENNE_A, _MERSENNE_B
    for _ in range(num_hashes):
        a = (a * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (b * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append((((a >> 34) | 1), (b >> 34)))
    return out


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a whitespace-tokenized text.

    Docs with fewer than n tokens yield an empty array — the sequence
    bound must be guarded, because F.sequence(1, stop) with stop < 1
    descends (step -1) and produces 0/negative indexes that make
    element_at abort the whole job.
    """
    words = F.split(F.trim(text), r"\s+")
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j) for j in range(n)]
    )
    return F.array_distinct(F.transform(idx, shingle_at))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: one surviving id per
    normalized text, with the duplicate count."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        df.select(F.col(id_col), F.md5(normalized).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingle_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    hashed: bool = False,
    distinct: bool = True,
    local_distinct: bool = False,
) -> DataFrame:
    """(doc, sh) shingle pairs for docs with >= n tokens.

    Narrow array assembly: split ONCE into a separate projection, index
    n-gram starts with sequence(), build each shingle with element_at,
    explode. Zero shuffles — shingling runs at scan throughput. (The
    split is referenced by every element_at, but it is a multi-referenced
    non-cheap alias, which Catalyst's CollapseProject keeps as its own
    projection instead of inlining — measured at sf0.1 this beats the
    earlier lead()-window assembly 0.51s vs 0.80s, since the window
    needed a full shuffle+sort on doc first.)

    ``hashed=True`` emits sh as xxhash64(shingle) int64 — the self-join
    then shuffles/compares longs, the scale path (collision odds across
    ~10^6 distinct shingles are ~1e-7; a collision would merge two
    shingles for both docs symmetrically)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    tok = df.select(F.col(id_col).alias("doc"), words.alias("__w"))
    idx = F.when(
        F.size("__w") >= n, F.sequence(F.lit(1), F.size("__w") - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at("__w", i + j) for j in range(n)]
    )
    assemble = (lambda i: F.xxhash64(mk(i))) if hashed else mk
    arr = F.transform(idx, assemble)
    # local_distinct: dedup INSIDE the row (array_distinct before the
    # explode). When ids are unique — every caller here — the result
    # equals the global distinct, with zero shuffle: per-row hash-set
    # work replaces a full exchange of the shingle table (guide §2.4,
    # remove shuffles outright).
    if local_distinct:
        return tok.select("doc", F.explode(F.array_distinct(arr)).alias("sh"))
    sh = tok.select("doc", F.explode(arr).alias("sh"))
    # distinct=False lets callers that immediately collect_set per doc
    # skip the extra dedup shuffle (the set aggregation dedups anyway)
    return sh.distinct() if distinct else sh


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs above threshold.

    Returns (doc1, doc2, jaccard) with doc1 < doc2, jaccard rounded to
    6 decimals. ``max_doc_freq`` drops shingles appearing in more than
    that many docs (posting-list cap for scale); None keeps all, which
    is required for exact oracle parity.
    """
    # One aggregation produces the per-doc shingle set; each join side
    # re-explodes it carrying the set SIZE alongside, so the pair loop
    # needs no size-lookup joins afterward (Spark does not reuse
    # identical exchange subtrees across self-join branches — every
    # extra branch is a full recompute, so branch count is the cost
    # model here: this shape is 2 scans, the naive
    # rows->join->sizes->join->join shape is 4).
    sh = _shingle_table(df, text_col, id_col, n, hashed=True, distinct=False)
    docsets = sh.groupBy("doc").agg(F.collect_set("sh").alias("shset"))
    if max_doc_freq is not None:
        freq = (
            sh.distinct()
            .groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_doc_freq)
            .select(F.collect_set("sh").alias("__stop"))
        )
        docsets = docsets.crossJoin(F.broadcast(freq)).select(
            "doc", F.array_except("shset", "__stop").alias("shset")
        )
    # both join sides below re-explode this frame, and Spark
    # re-evaluates each reference (shingle explode + collect_set
    # twice); materialize it once — one (doc, set) row per doc, the
    # same "persist the inverted-index source" move the prefix-filter
    # variant already makes with its perdoc frame. r17: persist (via
    # reuse_persist) instead of localCheckpoint — same branch dedup,
    # but lineage survives executor loss at cluster scale (guide §5).
    docsets = reuse_persist(docsets, "ngram_jaccard.docsets")

    def side(doc_alias: str, n_alias: str) -> DataFrame:
        return docsets.select(
            F.col("doc").alias(doc_alias),
            F.array_size("shset").alias(n_alias),
            F.explode("shset").alias("sh"),
        )

    return (
        side("doc1", "n1")
        .join(side("doc2", "n2"), "sh")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("common"), F.first("n1").alias("n1"), F.first("n2").alias("n2"))
        .withColumn(
            "jaccard",
            rnd(F.col("common") / (F.col("n1") + F.col("n2") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def prefix_filter_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    toks: DataFrame | None = None,
) -> DataFrame:
    """AllPairs/PPJoin-style prefix-filtered candidate pairs for an
    EXACT Jaccard >= threshold join (Bayardo, Ma & Srikant 2007
    "Scaling Up All Pairs Similarity Search"; Xiao et al. 2008 PPJoin).

    Shingles get a GLOBAL rare-first total order (document frequency
    asc, hash asc — fully deterministic); each doc's candidate-
    generating PREFIX is its first ``sz - ceil(t*sz) + 1`` shingles in
    that order, and candidates are pairs sharing a PREFIX shingle plus
    the length filter ``ceil(t*|x|) <= |y|`` both ways.

    Completeness (why this misses nothing): let g be the smallest
    common shingle of x and y under the global order. If g sat beyond
    x's prefix, x would hold at least ``|x| - ceil(t|x|) + 1``
    shingles smaller than g — all non-common by g's minimality — so
    the overlap could be at most ``ceil(t|x|) - 1``, contradicting
    ``|overlap| >= t*|union| >= ceil(t*|x|)`` for J >= t. Same for y:
    g lies in BOTH prefixes and the equality join finds the pair.

    vs the plain inverted index (ngram_jaccard_pairs): that joins on
    EVERY shingle (cost = sum over shingles of df^2); this joins only
    on prefix shingles, which the rare-first order makes the LOWEST-df
    shingles of each doc — the quadratic term shrinks to the rare end
    of the distribution — and the r9 PPJoin positional filter (see
    _candidates_from_prefix) prunes a further ~2.5x using the match
    ranks. tests/test_dedup.py asserts both the output equality and
    the candidate-count reduction (~35x total on the sf0.1 fixture).

    PRECONDITION: ``id_col`` values must be UNIQUE (one row per doc).
    The r16 row-local shingle dedup (array_distinct before the
    explode) equals a global distinct only under that assumption —
    with a duplicated id, the per-doc collect_list sizes inflate,
    skewing prefix lengths and the exact Jaccard. Every registry
    caller keys docs by a primary key; dedup an id-duplicated corpus
    first (e.g. exact_dedup) before calling.
    """
    prefix, _ = _prefix_frames(df, text_col, id_col, n, threshold, toks)
    return _candidates_from_prefix(prefix, threshold)


def _candidates_from_prefix(prefix: DataFrame, threshold: float) -> DataFrame:
    """The ONE candidate-generation join both public entry points
    share: self-join the exploded prefix frame on the prefix shingle,
    orient pairs doc1 < doc2, apply the two-way length filter AND the
    PPJoin POSITIONAL filter (Xiao et al. 2008), dedup. Factored so a
    future filter tweak cannot drift between
    :func:`prefix_filter_candidates` and :func:`prefix_filter_pairs`.

    Positional filters (r9 per-row form; r16 pair-level accumulated
    form, Xiao et al. 2008 PPJoin overlap accumulation). J >= t needs
    overlap >= ``alpha = ceil(t*(|x|+|y|)/(1+t))`` (the standard
    algebra from J = c/(|x|+|y|-c)). The pair-dedup groupBy — the same
    exchange the former ``.distinct()`` paid — now ALSO accumulates
    per pair: m (number of prefix-x-prefix matches), min/max matched
    ranks (i0,j0)/(im,jm), and checks TWO sound overlap upper bounds:

    1. ``1 + min(|x|-i0-1, |y|-j0-1) >= alpha`` — the smallest common
       shingle g* of a true pair sits in BOTH prefixes (prefix
       theorem), every other common shingle is > g* in the global
       order, so it ranks after (i0,j0) in both docs. This keeps
       exactly the pairs the r9 per-row filter kept (the per-row bound
       is maximized at the g* match row).
    2. ``m + min(|x|-im-1, |y|-jm-1) >= alpha`` — every common shingle
       NOT matched by the prefix-x-prefix join is absent from at least
       one prefix, so its rank there exceeds that prefix's length >
       the matched rank, hence it is > the largest matched shingle
       g_m globally and ranks after (im,jm) in BOTH docs; at most
       ``min`` remaining slots can hold such shingles. Strictly
       tighter than (1) when a pair matches several prefix shingles
       yet cannot reach alpha — a bound the row-at-a-time shape
       cannot express (measured: 124,839 -> 119,678 candidates on the
       sf0.1 fixture, output equality pinned at all three SFs).

    Match rows are NOT pre-filtered before the aggregation — dropping
    a row would undercount m and make bound (2) unsound. Completeness:
    for a true pair both bounds hold with c >= alpha, so the pair is
    kept; the filters only remove pairs that provably cannot reach
    the threshold, and the exact-Jaccard verify is unchanged."""
    left = prefix.select(
        F.col("doc").alias("doc1"), F.col("sz").alias("n1"),
        F.col("pos").alias("i"), "sh",
    )
    right = prefix.select(
        F.col("doc").alias("doc2"), F.col("sz").alias("n2"),
        F.col("pos").alias("j"), "sh",
    )
    alpha = F.ceil(
        F.lit(threshold) * (F.col("n1") + F.col("n2")) / F.lit(1.0 + threshold)
    )
    return (
        left.join(right, "sh")
        .filter(F.col("doc1") < F.col("doc2"))
        .filter(
            (F.col("n2") >= F.ceil(F.lit(threshold) * F.col("n1")))
            & (F.col("n1") >= F.ceil(F.lit(threshold) * F.col("n2")))
        )
        .groupBy("doc1", "doc2")
        .agg(
            F.count(F.lit(1)).alias("__m"),
            F.min("i").alias("__i0"),
            F.min("j").alias("__j0"),
            F.max("i").alias("__im"),
            F.max("j").alias("__jm"),
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
        )
        .filter(
            (
                1 + F.least(
                    F.col("n1") - F.col("__i0") - 1,
                    F.col("n2") - F.col("__j0") - 1,
                )
                >= alpha
            )
            & (
                F.col("__m") + F.least(
                    F.col("n1") - F.col("__im") - 1,
                    F.col("n2") - F.col("__jm") - 1,
                )
                >= alpha
            )
        )
        .select("doc1", "doc2")
    )


def _prefix_frames(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
    toks: DataFrame | None = None,
):
    """(prefix, perdoc): the exploded prefix frame (doc, sz, sh) and
    the per-doc rare-first-sorted shingle list (doc, sz, shset).

    ONE per-doc aggregation carries everything downstream: the sorted
    (df, sh) struct list yields the prefix slice, the set size, AND
    the verify-ready shingle set — where the naive shape pays separate
    shuffles for a sizes aggregate, a row_number window sort, and a
    collect_set verify aggregation (~7 exchanges vs 4; measured ~2x at
    sf0.1). The struct sort key (df_, sh) IS the global rare-first
    order, so slicing the sorted list is exactly the prefix."""
    if toks is None:
        # r16: row-local dedup (array_distinct before the explode)
        # replaces the former global .distinct() — identical (doc, sh)
        # set at one less full shuffle of the shingle table
        toks = _shingle_table(
            df, text_col, id_col, n, hashed=True, distinct=False,
            local_distinct=True,
        )
    # df via a count window on sh — one exchange where the
    # groupBy+join-back shape pays two full-size ones (freq aggregate
    # AND the re-shuffle of toks onto sh for the join).
    # r16 REJECTED experiment (kept as a warning): replacing the window
    # with groupBy(sh).agg(count, collect_list(doc)) + explode — the
    # same single exchange without the window's sort — measured a WASH
    # across 7 paired fresh-process A/B rounds at sf0.1 (ctrl mins
    # mean 3.01 s vs head 3.11 s; the sort is not the cost at this
    # scale), and it is strictly WORSE at 100 TB: WindowExec buffers a
    # partition group through an UnsafeExternalSorter that can SPILL,
    # while a hot shingle's collect_list doc array must fit one task's
    # heap. See OPTIMIZATION_r16.md.
    annotated = toks.withColumn(
        "df_", F.count(F.lit(1)).over(Window.partitionBy("sh"))
    )
    perdoc = (
        annotated
        .groupBy("doc")
        .agg(
            F.array_sort(F.collect_list(F.struct("df_", "sh"))).alias("__lst")
        )
        .select(
            "doc",
            F.array_size("__lst").alias("sz"),
            F.transform("__lst", lambda s: s["sh"]).alias("shset"),
        )
    )
    # referenced by prefix + both verify sides; persist (not
    # localCheckpoint) so lineage survives executor loss — see reuse.py
    perdoc = reuse_persist(perdoc, "prefix_frames.perdoc")
    prefix = perdoc.select(
        "doc",
        "sz",
        F.posexplode(
            F.slice(
                "shset",
                F.lit(1),
                (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int"),
            )
        ).alias("pos", "sh"),  # pos: 0-based rank in the rare-first order
    )
    return prefix, perdoc


def verified_jaccard_pairs(
    pairs: DataFrame, threshold: float, id1: str, id2: str
) -> DataFrame:
    """Shared exact-Jaccard verification tail: score candidate pairs
    carrying their two shingle-set arrays (``__s1``/``__s2``), then
    filter to ``jaccard >= threshold`` BEHIND AN OPTIMIZER FENCE.

    Without the fence, Catalyst pushes the threshold filter through
    the scoring Project into the verify join's condition, inlining
    the rounded-Jaccard expression in terms of __s1/__s2 — the
    physical plan's ``Join condition`` then evaluates
    ``array_intersect`` TWICE per candidate pair (numerator + union
    denominator) and the downstream Project recomputes it once more
    for the output column: ~3x the per-pair array work (r16 plan
    audit: every dedup verify join carried ``FLOOR(...
    array_intersect ... array_intersect ...)`` as its condition).
    ``Dataset.observe`` inserts a CollectMetrics node between the
    scoring Project and the Filter; pushing a filter below
    CollectMetrics would change the observed metric, so Catalyst
    leaves the filter referencing the ``jaccard`` column, and the
    multi-referenced non-cheap ``__common`` alias is computed ONCE
    per pair (CollapseProject keeps such aliases materialized). The
    metric doubles as verify telemetry: how many candidate pairs the
    verify actually scored.

    Applied where MEASURED to win — prefix_filter_pairs, whose
    ~120k-pair candidate set amortizes the fence (7/10 paired A/B
    rounds faster, median -10%, never slower on a clean round). The
    minhash/LSH verifies measured SLOWER fenced (small candidate
    sets; rejection numbers at those sites) — do not blanket-apply.

    The observation name derives from the INPUT PLAN's semantic hash
    (r17, replacing a module-global counter): deterministic — the
    same query rebuilt yields the identical plan, no cross-thread
    state — and distinct fenced subtrees inside one composed query
    get distinct names (Spark only rejects duplicate observation
    names on DIFFERENT subtrees). The plan shape the fence buys is
    pinned by tests/test_r17_optimizations.py::
    test_prefix_verify_fence_plan_shape, so a Spark upgrade that
    pushes filters through CollectMetrics again turns a silent 3x
    per-pair regression into a red test."""
    fence_id = pairs.semanticHash() & 0x7FFFFFFF
    scored = (
        pairs.withColumn(
            "__common", F.array_size(F.array_intersect("__s1", "__s2"))
        )
        .withColumn(
            "jaccard",
            rnd(
                F.col("__common")
                / (F.array_size("__s1") + F.array_size("__s2") - F.col("__common")),
                6,
            ),
        )
        .observe(
            f"jaccard_verify_{fence_id}",
            F.count(F.lit(1)).alias("verified_pairs"),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold).select(id1, id2, "jaccard")


def prefix_filter_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via prefix filtering — same
    output contract as :func:`ngram_jaccard_pairs` (doc1 < doc2,
    jaccard rounded to 6), different (stronger) candidate pruning.
    Candidate generation and verification share ONE per-doc
    aggregation (see :func:`_prefix_frames`); the verify intersects
    the full shingle sets of candidate pairs only.

    PRECONDITION: ``id_col`` values must be UNIQUE — see
    :func:`prefix_filter_candidates` (the row-local shingle dedup and
    the per-doc set sizes both assume one row per doc)."""
    prefix, perdoc = _prefix_frames(df, text_col, id_col, n, threshold)
    cand = _candidates_from_prefix(prefix, threshold)
    verify_input = (
        cand.join(
            perdoc.select(F.col("doc").alias("doc1"), F.col("shset").alias("__s1")),
            "doc1",
        )
        .join(
            perdoc.select(F.col("doc").alias("doc2"), F.col("shset").alias("__s2")),
            "doc2",
        )
    )
    return verified_jaccard_pairs(verify_input, threshold, "doc1", "doc2")


def minhash_signature(text: Column, n: int = 3, num_hashes: int = 32) -> Column:
    """MinHash signature (array<long>) over word shingles — JVM-side:
    xxhash64 base hash + affine permutations; min per permutation."""
    shingles = word_shingles(text, n)
    base = F.transform(shingles, lambda s: F.shiftrightunsigned(F.xxhash64(s), 33))
    sig = []
    for a, b in _perm_consts(num_hashes):
        sig.append(
            F.array_min(
                F.transform(base, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P))
            )
        )
    return F.array(*sig)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH + exact-Jaccard verify.

    Candidate pairs collide in >= 1 of ``bands`` bands (rows/band =
    num_hashes/bands); candidates are then verified with the exact
    shingle Jaccard, so output == ngram_jaccard_pairs restricted to
    LSH-recalled pairs. Scale: candidates are generated from band-key
    groupBys (linear), never an all-pairs product.
    """
    rows_per_band = num_hashes // bands
    # Relational MinHash: ONE groupBy(doc) carrying all num_hashes
    # min-aggregates (min(a_i*h + b_i) per permutation) AND the
    # collect_set verify set — each shingle row touched once,
    # partial-aggregated map-side, fully codegen'd. Duplicate shingles
    # can't change a min, so the shingle frame skips its distinct
    # shuffle entirely; the verification sets dedup inside collect_set
    # for the same reason. (A pure column-expression signature — 32
    # nested array_min(transform(...)) over the raw text — would get
    # the tokenizer re-inlined into every permutation by Catalyst's
    # projection collapse: O(perms x shingles x split)/row.)
    #
    # The fused per-doc frame is materialized once (persist — lazy,
    # lineage-preserving; see reuse_persist): it feeds FOUR downstream branches (both sides
    # of the band-key self-join and both verify joins), and Spark
    # re-evaluates every reference — before the fuse the shingle
    # explode + groupBy ran up to 4x per query. One row per doc
    # (signature + shingle set — the bytes an LSH index materializes
    # anyway), so at cluster scale this is "persist the signature
    # table before the band join".
    sh = _shingle_table(df, text_col, id_col, n, hashed=True, distinct=False)
    consts = _perm_consts(num_hashes)
    h = F.shiftrightunsigned("sh", 33)
    per_doc = (
        sh.groupBy("doc")
        .agg(
            F.collect_set("sh").alias("shset"),
            *[
                F.min((h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"__m{i}")
                for i, (a, b) in enumerate(consts)
            ],
        )
    )
    per_doc = reuse_persist(per_doc, "minhash_lsh.per_doc")
    mins = per_doc
    docsets = per_doc.select("doc", "shset")
    band_structs = []
    for b_i in range(bands):
        members = [
            F.col(f"__m{i}")
            for i in range(b_i * rows_per_band, (b_i + 1) * rows_per_band)
        ]
        # xxhash64 over the band's min values: an 8-byte join key (vs a
        # 32-char md5 string) — cheaper to compute and 4x fewer shuffle
        # bytes per band row
        band_structs.append(
            F.struct(F.lit(b_i).alias("band"), F.xxhash64(*members).alias("bkey"))
        )
    banded = mins.select("doc", F.explode(F.array(*band_structs)).alias("__b")).select(
        "doc", F.col("__b.band").alias("band"), F.col("__b.bkey").alias("bkey")
    )

    left = banded.select("band", "bkey", F.col("doc").alias("doc1"))
    right = banded.select("band", "bkey", F.col("doc").alias("doc2"))
    candidates = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )

    # Verify ONLY the candidates (never the all-pairs Jaccard): join
    # each side's shingle set back in and intersect. Cost is
    # |candidates| x avg shingle-set size — independent of the corpus
    # pair space, which is what makes LSH the 100 TB path.
    # r16 REJECTED: the verified_jaccard_pairs observe-fence (accepted
    # for prefix_filter_pairs) measured +5..+21% HERE across 3 paired
    # fresh-process A/B rounds (ctrl mins 1.519/1.501/1.524 vs fenced
    # 1.833/1.569/1.822 at sf0.1) — the LSH candidate set is too small
    # for the saved array_intersect evals to beat the extra
    # CollectMetrics pipeline break. Same verdict for the portable
    # twin and dedup_lsh_index_probe (+11/+15%). See OPTIMIZATION_r16.md.
    return (
        candidates.join(
            docsets.select(F.col("doc").alias("doc1"), F.col("shset").alias("__s1")), "doc1"
        )
        .join(docsets.select(F.col("doc").alias("doc2"), F.col("shset").alias("__s2")), "doc2")
        .withColumn("__common", F.array_size(F.array_intersect("__s1", "__s2")))
        .withColumn(
            "jaccard",
            rnd(
                F.col("__common")
                / (F.array_size("__s1") + F.array_size("__s2") - F.col("__common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


SIMHASH_PORTABLE_BITS = 60  # 15 md5 hex chars: fits signed int64 positively


def simhash_pairs_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs whose EVERY step is engine-portable —
    the differentially-verifiable twin of :func:`simhash_pairs`.

    The per-token bit source is the first 60 bits of md5 (15 hex
    chars — stays positive in a signed int64, so the identical CAST
    works in any engine) over the DISTINCT token set; votes, the
    60-bit fingerprint, the 4×15-bit pigeonhole bands, and the
    bit_count(xor) Hamming verify are all integer arithmetic, so the
    SQL oracle replays the exact pair set. Production
    :func:`simhash_pairs` keeps xxhash64 (one cheap hash, full 64
    bits); this one trades a crypto hash per distinct token for
    replayability.

    Bit-source diversity property-tested: tests/test_properties.py
    ``test_simhash_bit_source_balanced_and_uncorrelated`` (per-bit
    balance + pairwise bit independence over the md5 family).
    """
    bits = SIMHASH_PORTABLE_BITS
    toks = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .distinct()
        .select(
            "doc",
            F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    voted = toks.groupBy("doc").agg(*votes)
    sh = F.lit(0).cast("long")
    for j in range(bits):
        sh = sh + F.when(
            F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
    docs = voted.select("doc", sh.alias("sh60"))

    bands = []
    for b_i in range(4):
        key = F.shiftrightunsigned(F.col("sh60"), 15 * b_i).bitwiseAND(F.lit(0x7FFF))
        bands.append(
            docs.select("doc", "sh60", F.lit(b_i).alias("band"), key.alias("bkey"))
        )
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionByName(extra)
    left = banded.select("band", "bkey", F.col("doc").alias("doc1"), F.col("sh60").alias("h1"))
    right = banded.select("band", "bkey", F.col("doc").alias("doc2"), F.col("sh60").alias("h2"))
    return (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select(
            "doc1",
            "doc2",
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _portable_doc_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """(doc, h) shingle hashes in the engine-portable md5 family,
    folded below the permutation modulus (plain %, identical in any
    engine). Fold uniformity + order-independence property-tested:
    tests/test_properties.py ``test_portable_shingle_fold_uniform``."""
    sh = _shingle_table(df, text_col, id_col, n, hashed=False, distinct=False)
    h32 = F.conv(F.substring(F.md5(F.col("sh")), 1, 8), 16, 10).cast("long")
    return sh.select("doc", (h32 % F.lit(MINHASH_P)).alias("h"))


def _portable_band_keys_from_mins(
    mins: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(doc, band, bkey) from a frame carrying ``__m0..__m{n-1}``
    permutation minima — the ONE band-key construction both portable
    paths derive keys from (the persisted-index build in
    :func:`minhash_band_keys_portable` and the fused one-shot path in
    :func:`minhash_lsh_pairs_portable`). Factored (r16 ADVICE) so the
    two can never drift: a probe batch keyed by one implementation
    against an index built by a diverged copy would silently miss
    candidates. bkey is the '_'-joined min values per band —
    engine-portable string concatenation an SQL oracle replays."""
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("bands must divide num_hashes")
    band_structs = []
    for b_i in range(bands):
        members = [
            F.col(f"__m{i}").cast("string")
            for i in range(b_i * rows_per_band, (b_i + 1) * rows_per_band)
        ]
        band_structs.append(
            F.struct(
                F.lit(b_i).alias("band"),
                F.concat_ws("_", *members).alias("bkey"),
            )
        )
    return mins.select(
        "doc", F.explode(F.array(*band_structs)).alias("__b")
    ).select("doc", F.col("__b.band").alias("band"), F.col("__b.bkey").alias("bkey"))


def minhash_band_keys_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(doc, band, bkey) banded MinHash keys in the engine-portable md5
    family — the INDEX half of LSH dedup, factored out so it can be
    PERSISTED (a maintained band-key table a production pipeline
    probes each new batch against — see dedup_lsh_index_probe) as well
    as self-joined for one-shot pair finding
    (:func:`minhash_lsh_pairs_portable`)."""
    hashed = _portable_doc_hashes(df, text_col, id_col, n)
    consts = _perm_consts(num_hashes)
    mins = hashed.groupBy("doc").agg(
        *[
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"__m{i}")
            for i, (a, b) in enumerate(consts)
        ]
    )
    return _portable_band_keys_from_mins(mins, num_hashes, bands)


def minhash_lsh_pairs_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Banded MinHash-LSH whose EVERY step is engine-portable — the
    differentially-verifiable twin of :func:`minhash_lsh_pairs`.

    Same algorithm (shingle → per-permutation min → band keys →
    candidate join → exact-Jaccard verify), but the base hash is the
    first 32 bits of md5 (computable in any engine) instead of
    xxhash64, and band keys are the concatenated min values instead of
    an xxhash64 fold — so a SQL oracle can replay the *identical*
    candidate generation and the output hash-matches end to end. That
    closes the usual LSH verification gap: not just "recall is high
    vs brute force" but "these exact pairs, via these exact bands".

    The production variant keeps xxhash64 (cheaper per shingle, 8-byte
    band keys = 4x fewer shuffle bytes); this one trades ~2x hash cost
    for replayability — the right trade for audits and cross-engine
    regression gates, not for the 100 TB hot path.
    """
    # Fused per-doc aggregation (same shape as minhash_lsh_pairs): one
    # groupBy carries the verify set AND every permutation min, and the
    # materialized frame feeds all four downstream branches — without
    # it the md5 shingle hashing (the expensive part of the portable
    # family) re-ran per branch.
    hashed = _portable_doc_hashes(df, text_col, id_col, n)
    consts = _perm_consts(num_hashes)
    per_doc = (
        hashed.groupBy("doc")
        .agg(
            F.collect_set("h").alias("shset"),
            *[
                F.min(
                    (F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)
                ).alias(f"__m{i}")
                for i, (a, b) in enumerate(consts)
            ],
        )
    )
    per_doc = reuse_persist(per_doc, "minhash_lsh_portable.per_doc")
    # band keys from the SAME helper the persisted index uses — the
    # probe/index contract cannot drift (r16 ADVICE)
    banded = _portable_band_keys_from_mins(per_doc, num_hashes, bands)

    left = banded.select("band", "bkey", F.col("doc").alias("doc1"))
    right = banded.select("band", "bkey", F.col("doc").alias("doc2"))
    candidates = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )
    docsets = per_doc.select("doc", "shset")
    return (
        candidates.join(
            docsets.select(F.col("doc").alias("doc1"), F.col("shset").alias("__s1")),
            "doc1",
        )
        .join(
            docsets.select(F.col("doc").alias("doc2"), F.col("shset").alias("__s2")),
            "doc2",
        )
        .withColumn("__common", F.array_size(F.array_intersect("__s1", "__s2")))
        .withColumn(
            "jaccard",
            rnd(
                F.col("__common")
                / (F.array_size("__s1") + F.array_size("__s2") - F.col("__common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def char_ngram_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 32,
    min_shared: int = 5,
) -> DataFrame:
    """Substring-level duplication pairs: docs sharing >= ``min_shared``
    distinct character k-grams (the signal behind exact-substring
    training-data dedup, cf. Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better" — a long shared char run means
    copied passages even when word-level Jaccard is low).

    Grams are xxhash64-hashed so the self-join shuffles longs, not
    32-char strings (collision odds across a corpus's distinct grams
    are ~|grams|^2 / 2^65 — vanishing, and deterministic given the
    fixed hash). Same inverted-index blocking shape as
    ngram_jaccard_pairs: cost is sum over grams of bucket^2, so only
    genuinely shared substrings pay."""
    n = F.length(F.col(text_col))
    idx = F.when(
        n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(
                F.transform(idx, lambda i: F.xxhash64(F.col(text_col).substr(i, F.lit(k))))
            )
        ).alias("g"),
    )
    # Spark never shares self-join subtrees: without materialization
    # the gram table (substr + hash over every char offset) is computed
    # once PER SIDE; materializing is a ~40% win measured at sf0.1.
    # persist (not localCheckpoint) = the same dedup with recompute-on-
    # loss lineage — "persist the gram table before the join" at scale.
    grams = reuse_persist(grams, "char_ngram.grams")
    left = grams.select(F.col("doc").alias("doc1"), "g")
    right = grams.select(F.col("doc").alias("doc2"), "g")
    return (
        left.join(right, "g")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def with_simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, sh64): 64-bit SimHash of the whitespace tokens per doc.

    Bit j of sh64 is 1 iff the sum over tokens of sign(bit j of
    xxhash64(token)) is positive. Computed relationally — explode
    tokens, then ONE groupBy with 64 conditional-sum aggregates (all
    partial-aggregated map-side) — rather than a 64-level nested array
    fold, so whole-stage codegen stays happy and the operator scales
    like any other aggregation.
    """
    toks = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .select("doc", F.xxhash64(F.col("tok")).alias("h"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(64)
    ]
    voted = toks.groupBy("doc").agg(*votes)
    sh = F.lit(0).cast("long")
    for j in range(64):
        sh = sh + F.when(
            F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
    return voted.select("doc", sh.alias("sh64"))


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Banded into 4x16-bit keys (pigeonhole: Hamming<=3 pairs agree on
    >=1 band), then verified with bit_count(xor). Linear candidate
    generation, no all-pairs product.
    """
    docs = with_simhash(df, text_col, id_col)
    bands = []
    for b_i in range(4):
        key = F.shiftrightunsigned(F.col("sh64"), 16 * b_i).bitwiseAND(F.lit(0xFFFF))
        bands.append(docs.select("doc", "sh64", F.lit(b_i).alias("band"), key.alias("bkey")))
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionByName(extra)

    left = banded.select("band", "bkey", F.col("doc").alias("doc1"), F.col("sh64").alias("h1"))
    right = banded.select("band", "bkey", F.col("doc").alias("doc2"), F.col("sh64").alias("h2"))
    return (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
