"""Similarity search over embedding columns (north-star component).

- cosine_topk: exact brute-force top-k — broadcast the (small) query
  set against the corpus, JVM-side dot product via zip_with/aggregate
  higher-order functions (no UDF, no Python in the hot path), then a
  per-query TakeOrdered. At 100 TB the corpus side stays fully
  partitioned; only queries broadcast.
- lsh_topk: random-hyperplane (sign) LSH — deterministic seeded
  planes, bucket on the sign-bit key, search only colliding buckets,
  exact rerank inside. The scale path: candidate generation is a
  bucket-equality shuffle join instead of a full cross product.

All ranking uses round(cos, 6) with vec_id tiebreak so top-k is
deterministic across partitionings and engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from quack_reduce_spark.functions.numeric import rnd


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM higher-order fns)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force baseline).

    Returns (query_id, vec_id, cos_sim, rank). Queries are broadcast;
    the corpus never shuffles until the final per-query top-k (a
    TakeOrdered over k*|queries| rows).
    """
    # Stage each side's L2 norm ONCE per row before the cross join:
    # written inline (cosine = dot/(norm*norm)) both norms re-evaluate
    # per PAIR — the corpus norm |queries| times and the query norm
    # |corpus| times, tripling the per-pair array work. The staged
    # columns are multi-referenced, which CollapseProject keeps
    # materialized (the quantized_topk scale-staging contract below).
    # Same expression tree per value, so scores are bit-identical.
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("__qid"),
            F.col(vec_col).alias("__qvec"),
        ).select("__qid", "__qvec", l2_norm(F.col("__qvec")).alias("__qn"))
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(vec_col).alias("__cvec")
    ).select("__cid", "__cvec", l2_norm(F.col("__cvec")).alias("__cn"))
    scored = q.crossJoin(c).select(
        F.col("__qid").alias(query_id),
        F.col("__cid").alias(corpus_id),
        rnd(
            dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qn") * F.col("__cn")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Top-k by int8-scalar-quantized dot product — the memory/bandwidth
    scale path for brute-force search (4x smaller vectors than float32,
    8x smaller than float64; integer dot products vectorize).

    Per-vector symmetric quantization: scale = max|x| / 127,
    q_i = floor(x_i/scale + 0.5) (explicit half-up floor so Spark and
    any SQL oracle round identically). Approximate score =
    scale_a * scale_b * Σ q_a·q_b, ranked with the usual
    (score desc, id asc) deterministic tiebreak. At 100 TB the corpus
    is stored pre-quantized (int8 column + one float scale), so the
    scan moves 1/4 the bytes and the rerank against full-precision
    vectors touches only the top candidates.

    The scale is staged as its OWN projection column before the
    per-element lambda uses it. Written inline, CollapseProject
    inlines the (single-referenced) scale expression INTO the lambda
    body, recomputing ``array_max(transform(abs))`` for every element
    — O(dim^2) per row, measured ~9x slower end-to-end at dim 64 and
    the round-9 rehearsal's superlinear tail. Referencing the staged
    column twice (output + lambda) makes it multi-referenced and
    non-cheap, which Spark 4's CollapseProject keeps materialized
    per row (the same optimizer contract the shingle assembly relies
    on).
    """
    def _quantize(df: DataFrame, id_col: str, out_id: str) -> DataFrame:
        v = _as_double(F.col(vec_col))
        s = F.greatest(
            F.array_max(F.transform(v, F.abs)) / F.lit(127.0), F.lit(1e-12)
        )
        staged = df.select(F.col(id_col).alias(out_id), v.alias("__v"), s.alias("__s"))
        return staged.select(
            out_id,
            F.col("__s"),
            F.transform(
                "__v", lambda x: F.floor(x / F.col("__s") + F.lit(0.5))
            ).alias("__q"),
        )

    q = F.broadcast(
        _quantize(queries, query_id, "__qid").select(
            "__qid", F.col("__s").alias("__qs"), F.col("__q").alias("__qq")
        )
    )
    c = _quantize(corpus, corpus_id, "__cid").select(
        "__cid", F.col("__s").alias("__cs"), F.col("__q").alias("__cq")
    )
    int_dot = F.aggregate(
        F.zip_with(F.col("__qq"), F.col("__cq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = q.crossJoin(c).select(
        F.col("__qid").alias(query_id),
        F.col("__cid").alias(corpus_id),
        rnd(F.col("__qs") * F.col("__cs") * int_dot.cast("double"), 6).alias("approx_dot"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("approx_dot").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "approx_dot", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: splitmix64-style
    integer mixing → uniform in [-1, 1], then block Gram-Schmidt
    orthonormalization.

    Orthogonalization matters (r8, found by the hash-family diversity
    battery in tests/test_properties.py): raw uniform draws at
    dim=16 gave plane pairs with |cos| up to 0.48, i.e. bucket-bit
    agreements as far as 0.64 from the ideal 0.5 — correlated planes
    shrink the effective bit count of the bucket key, the same
    family-correlation disease (milder) as the r7 MinHash permutation
    bug. Orthonormal planes make every bit-pair agreement exactly 0.5
    in expectation. When n_planes > dim, planes are orthogonalized in
    blocks of ``dim`` (full mutual orthogonality is impossible; each
    block is independent of the others' draws)."""
    state = seed & 0xFFFFFFFFFFFFFFFF

    def draw() -> float:
        nonlocal state
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        return (z / float(1 << 64)) * 2.0 - 1.0

    planes: list[list[float]] = []
    block: list[list[float]] = []
    for _ in range(n_planes):
        if len(block) == dim:
            block = []
        while True:
            row = [draw() for _ in range(dim)]
            # modified Gram-Schmidt against this block's previous rows
            for prev in block:
                proj = sum(a * b for a, b in zip(row, prev))
                row = [a - proj * b for a, b in zip(row, prev)]
            norm = sum(a * a for a in row) ** 0.5
            if norm > 1e-9:  # a.s. true; redraw on degenerate remainder
                break
        row = [a / norm for a in row]
        block.append(row)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-LSH bucket id (int): bit p set iff vec · plane_p > 0."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    probe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors whose sign-LSH
    bucket is within Hamming distance ``probe_bits`` of the query's
    bucket (multi-probe LSH), exact cosine rerank inside.

    Returns (query_id, vec_id, cos_sim, rank) — possibly fewer than k
    rows per query (recall tradeoff; on isotropic random vectors recall
    is inherently low — LSH pays off when the corpus is clustered).
    The bucket join shuffles on the bucket key; probed buckets per
    query = sum of C(n_planes, d) for d <= probe_bits (all XOR masks
    of Hamming weight up to probe_bits, not just single-bit flips).
    """
    from itertools import combinations

    probe_offsets = [0]
    for dist in range(1, min(probe_bits, n_planes) + 1):
        for bits in combinations(range(n_planes), dist):
            mask = 0
            for p in bits:
                mask |= 1 << p
            probe_offsets.append(mask)
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        F.explode(
            F.array(
                *[
                    lsh_bucket(F.col(vec_col), dim, n_planes).bitwiseXOR(F.lit(off))
                    for off in probe_offsets
                ]
            )
        ).alias("__bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(vec_col).alias("__cvec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("__bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "__bucket")
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            rnd(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def _portable_bucket(vec_col, planes: list[list[int]]):
    """Integer sign-LSH bucket from md5-parity ±1 planes over
    quantized components (see lsh_cosine_pairs_portable) — bit p set
    iff Σ s(p,j)·floor(x_j·1e6+0.5) > 0. Exact in any engine."""
    q = F.transform(
        _as_double(vec_col),
        lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
    )
    b = F.lit(0)
    for p, signs in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                q,
                F.array(*[F.lit(s) for s in signs]),
                lambda a, sb: a * sb.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        b = b + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return b


def lsh_topk_portable(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Multi-probe sign-LSH top-k whose buckets are engine-portable —
    the differentially-verifiable twin of :func:`lsh_topk` (md5-parity
    ±1 planes + integer-quantized projections instead of seeded
    Gaussian hyperplanes). Queries probe their own bucket plus every
    single-bit flip (Hamming ≤ 1); candidates rerank by exact cosine.
    The SQL oracle replays buckets, probes, and rerank identically."""
    planes = portable_plane_signs(n_planes, dim)
    probe_offsets = [0] + [1 << p for p in range(n_planes)]
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        F.explode(
            F.array(
                *[
                    _portable_bucket(F.col(vec_col), planes).bitwiseXOR(F.lit(off))
                    for off in probe_offsets
                ]
            )
        ).alias("__bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(vec_col).alias("__cvec"),
        _portable_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "__bucket")
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            rnd(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cos_sim"),
        )
        # no dedup needed: each corpus vector owns exactly one bucket
        # and the probe offsets are distinct, so (query, candidate)
        # pairs are unique by construction
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    round(cos, 6) >= threshold).

    This is the oracle-checkable baseline (O(n^2) pair space). Norms
    are computed once per row *before* the join so the pair loop only
    evaluates the dot product. At 100 TB the exact variant is
    infeasible by construction — use :func:`lsh_cosine_pairs`, whose
    candidate generation is a bucket-equality shuffle join; this
    function remains the ground truth that recall is measured against.
    """
    e = df.select(
        F.col(id_col).alias("__id"),
        _as_double(F.col(vec_col)).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    a = e.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na")
    )
    b = e.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            rnd(dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_cosine_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_bands: int = 8,
    planes_per_band: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded sign-LSH blocking —
    the 100 TB scale path for :func:`cosine_pairs`.

    Each vector gets ``n_bands`` independent sign-LSH bucket keys
    (``planes_per_band`` hyperplanes each, distinct seeds). Candidate
    pairs are those colliding in >= 1 band (an equality shuffle join on
    (band, bucket), linear candidate generation), then every candidate
    is verified with the exact cosine, so the output is a SUBSET of the
    exact result — precision 1.0, recall measured in tests. Collision
    probability per band for angle theta is (1 - theta/pi)^planes;
    with 8 bands of 4 planes, cos >= 0.4 (theta <= 66.4deg) collides
    with p >= 1 - (1 - 0.2^4)/band ~= high recall on clustered data.
    """
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.posexplode(
            F.array(
                *[
                    lsh_bucket(F.col(vec_col), dim, planes_per_band, seed=1000 + band)
                    for band in range(n_bands)
                ]
            )
        ).alias("__band", "__bucket"),
    )
    other = keyed.select(
        F.col("__id").alias("__id_b"),
        F.col("__vec").alias("__vec_b"),
        F.col("__band").alias("__band_b"),
        F.col("__bucket").alias("__bucket_b"),
    )
    candidates = (
        keyed.join(
            other,
            (F.col("__band") == F.col("__band_b"))
            & (F.col("__bucket") == F.col("__bucket_b"))
            & (F.col("__id") < F.col("__id_b")),
        )
        .select(
            F.col("__id").alias("id_a"),
            F.col("__id_b").alias("id_b"),
            F.col("__vec").alias("__va"),
            F.col("__vec_b").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return candidates.select(
        "id_a",
        "id_b",
        rnd(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def portable_plane_signs(planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane components from md5 parity —
    integers ANY engine can re-derive (md5 of "p:j", first byte's
    parity). A ±1 random projection is a valid sign-LSH family
    (Achlioptas-style sparse projections), and unlike seeded float
    Gaussians it is exactly portable to a SQL oracle."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:2], 16) % 2 == 0 else -1
            for j in range(dim)
        ]
        for p in range(planes)
    ]


def lsh_cosine_pairs_portable(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_bands: int = 4,
    planes_per_band: int = 4,
) -> DataFrame:
    """Banded sign-LSH near-dup pairs whose EVERY step is engine-
    portable — the differentially-verifiable twin of
    :func:`lsh_cosine_pairs` (same algorithm; md5-parity ±1 planes
    instead of seeded Gaussian hyperplanes).

    Projections are computed on INTEGER-quantized components
    (floor(x·1e6+0.5) as int64), so the sign of Σ ±x_q is exact
    integer arithmetic — no floating-point summation order can flip a
    bucket bit between engines. Candidates collide in ≥1 band; every
    candidate is verified with the exact cosine, so the output is a
    precision-1.0 subset of :func:`cosine_pairs` and the SQL oracle
    replays the identical pair set.
    """
    planes = portable_plane_signs(n_bands * planes_per_band, dim)
    q = F.transform(
        _as_double(F.col(vec_col)),
        lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
    )
    bits = []
    for signs in planes:
        proj = F.aggregate(
            F.zip_with(
                q,
                F.array(*[F.lit(s) for s in signs]),
                lambda a, b: a * b.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*bits[b * planes_per_band : (b + 1) * planes_per_band]).alias(
                "bkey"
            ),
        )
        for b in range(n_bands)
    ]
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.explode(F.array(*band_structs)).alias("__b"),
    ).select(
        "__id",
        "__vec",
        F.col("__b.band").alias("__band"),
        F.col("__b.bkey").alias("__bucket"),
    )
    other = keyed.select(
        F.col("__id").alias("__id_b"),
        F.col("__vec").alias("__vec_b"),
        F.col("__band").alias("__band_b"),
        F.col("__bucket").alias("__bucket_b"),
    )
    candidates = (
        keyed.join(
            other,
            (F.col("__band") == F.col("__band_b"))
            & (F.col("__bucket") == F.col("__bucket_b"))
            & (F.col("__id") < F.col("__id_b")),
        )
        .select(
            F.col("__id").alias("id_a"),
            F.col("__id_b").alias("id_b"),
            F.col("__vec").alias("__va"),
            F.col("__vec_b").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return candidates.select(
        "id_a",
        "id_b",
        rnd(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def _centroids(corpus: DataFrame, vec_col: str, nlist: int, corpus_id: str) -> DataFrame:
    """Deterministic IVF coarse centroids: seed with the ``nlist``
    lowest-id corpus vectors, then one distributed Lloyd iteration
    (assign all vectors to nearest seed, mean per cell). Entirely
    JVM-side: the mean over array columns is posexplode -> avg ->
    array_sort(collect_list(struct(pos, mean))) rebuild.
    """
    # the seed row's own corpus_id IS the cell id: cells only need a
    # distinct, deterministic key (join/group/tiebreak), and id order
    # equals rank order — no global row_number window needed
    seeds = F.broadcast(
        corpus.orderBy(F.col(corpus_id).asc())
        .limit(nlist)
        .select(
            F.col(corpus_id).alias("__cell"),
            _as_double(F.col(vec_col)).alias("__seed_vec"),
        )
    )
    # argmax via max_by in ONE hash aggregate (partial-aggregated
    # map-side) — a window row_number would sort every (row x seed)
    # pair instead; ordering key (__d, -__cell) ties to the lowest cell
    assigned = (
        corpus.crossJoin(seeds)
        .withColumn("__d", dot(F.col(vec_col), F.col("__seed_vec")))
        .groupBy(corpus_id)
        .agg(
            F.max_by(
                F.struct(F.col("__cell"), F.col(vec_col).alias("__vec")),
                F.struct(F.col("__d"), (-F.col("__cell")).alias("__tb")),
            ).alias("__best")
        )
        .select(corpus_id, F.col("__best.__cell").alias("__cell"), F.col(f"__best.__vec").alias(vec_col))
    )
    comp = assigned.select(
        "__cell", F.posexplode(_as_double(F.col(vec_col))).alias("__pos", "__val")
    )
    return (
        comp.groupBy("__cell", "__pos")
        .agg(F.avg("__val").alias("__mean"))
        .groupBy("__cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__mean"))),
                lambda s: s["__mean"],
            ).alias("__centroid")
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus into ``nlist``
    coarse cells (deterministic seeded centroids + one Lloyd step),
    probe the ``nprobe`` nearest cells per query, exact cosine rerank
    inside the probed cells only.

    Scale shape: centroids are tiny and broadcast everywhere; the
    corpus is scanned once to assign cells (in a real deployment this
    is precomputed and the table is PARTITIONED BY cell, turning probes
    into partition pruning); each query touches nprobe/nlist of the
    data. Returns (query_id, vec_id, cos_sim, rank) — recall vs the
    exact scan is asserted in tests, not 1.0 by construction.
    """
    cents = F.broadcast(_centroids(corpus, vec_col, nlist, corpus_id))
    assigned = (
        corpus.crossJoin(cents)
        .withColumn(
            "__d", dot(F.col(vec_col), F.col("__centroid")) / l2_norm(F.col("__centroid"))
        )
        .groupBy(corpus_id)
        .agg(
            F.max_by(
                F.struct(F.col("__cell"), F.col(vec_col).alias("__vec")),
                F.struct(F.col("__d"), (-F.col("__cell")).alias("__tb")),
            ).alias("__best")
        )
        .select(
            F.col(corpus_id).alias("__cid"),
            F.col("__best.__cell").alias("__cell"),
            F.col("__best.__vec").alias("__cvec"),
        )
    )
    probes = (
        queries.crossJoin(cents)
        .withColumn(
            "__d", dot(F.col(vec_col), F.col("__centroid")) / l2_norm(F.col("__centroid"))
        )
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(F.col("__d").desc(), F.col("__cell").asc())
            ),
        )
        .filter(F.col("__rk") <= nprobe)
        .select(F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qvec"), "__cell")
    )
    scored = F.broadcast(probes).join(assigned, "__cell").select(
        F.col("__qid").alias(query_id),
        F.col("__cid").alias(corpus_id),
        rnd(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def ivf_build(
    corpus: DataFrame,
    path: str,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
) -> None:
    """Precompute the IVF layout (the 100 TB deployment of ivf_topk):
    cell-assign every corpus vector once, write the corpus
    ``PARTITIONED BY cell`` plus the tiny centroid table. After this,
    probing is partition pruning — queries read nprobe/nlist of the
    data straight off the lake layout, no assignment scan.

    Assignment is identical to ivf_topk's (normalized centroid dot,
    lowest-cell tiebreak), so prebuilt results match the in-memory
    operator exactly.
    """
    cents = _centroids(corpus, vec_col, nlist, corpus_id)
    bc = F.broadcast(cents)
    assigned = (
        corpus.crossJoin(bc)
        .withColumn(
            "__d", dot(F.col(vec_col), F.col("__centroid")) / l2_norm(F.col("__centroid"))
        )
        .groupBy(corpus_id)
        .agg(
            F.max_by(
                F.struct(F.col("__cell"), F.col(vec_col).alias("__vec")),
                F.struct(F.col("__d"), (-F.col("__cell")).alias("__tb")),
            ).alias("__best")
        )
        .select(
            F.col(corpus_id),
            F.col("__best.__vec").alias(vec_col),
            F.col("__best.__cell").alias("cell"),
        )
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/corpus")
    cents.select(
        F.col("__cell").alias("cell"), F.col("__centroid").alias("centroid")
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_prebuilt(
    spark,
    queries: DataFrame,
    path: str,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """IVF top-k over an ivf_build layout: rank cells per query against
    the stored centroids, collect the probed cell ids (bounded by
    nlist — this IS the 'probes become partition pruning' move: the
    cell list becomes a literal IN filter on the partition column, so
    the parquet scan plans with `nprobe parts selected`), then exact
    cosine rerank inside the pruned partitions only. Result-identical
    to ivf_topk on the same corpus."""
    cents = F.broadcast(
        spark.read.parquet(f"{path}/centroids").select(
            F.col("cell").alias("__cell"), F.col("centroid").alias("__centroid")
        )
    )
    probes = (
        queries.crossJoin(cents)
        .withColumn(
            "__d", dot(F.col(vec_col), F.col("__centroid")) / l2_norm(F.col("__centroid"))
        )
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(F.col("__d").desc(), F.col("__cell").asc())
            ),
        )
        .filter(F.col("__rk") <= nprobe)
        .select(F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qvec"), F.col("__cell").alias("cell"))
    )
    cells = sorted(r["cell"] for r in probes.select("cell").distinct().collect())
    pruned = spark.read.parquet(f"{path}/corpus").filter(F.col("cell").isin(cells))
    scored = F.broadcast(probes).join(pruned, "cell").select(
        F.col("__qid").alias(query_id),
        F.col(corpus_id),
        rnd(cosine(F.col("__qvec"), F.col(vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def cosine_topk_vectorized(
    spark,
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k with the scoring kernel as an
    Arrow-batched mapInPandas numpy matmul (the vectorized-UDF path for
    dense numeric kernels, vs cosine_topk's interpreted JVM fold).

    The query matrix is tiny and ships in the task closure (the
    explicit broadcast analog); each corpus batch computes a
    (batch x queries) score matrix in one BLAS call and keeps only its
    LOCAL top-k per query, so the per-partition output is bounded at
    k rows per query regardless of batch size — the same partial-top-k
    discipline TakeOrderedAndProject applies. Final exact top-k via the
    usual window. numpy's pairwise summation differs from the JVM fold
    in the last ulp, so results are unit-tested for id-set equality
    against cosine_topk, not hash-matched.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(query_id, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for batch in batches:
            if not len(batch):
                continue
            c_ids = batch[corpus_id].to_numpy()
            c_mat = np.array(list(batch[vec_col]), dtype=np.float64)
            c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_norm @ q_norm.T  # (batch, nq)
            # round to 1e-6 BEFORE the local prune with the same
            # floor(x*1e6+0.5)/1e6 rule the final window applies, and
            # break ties by ascending corpus id — the window's exact
            # total order. Pruning under any other order (e.g.
            # argpartition on raw BLAS scores) could locally drop a
            # candidate that ties the k-th ROUNDED score yet wins the
            # global id tiebreak — a data-dependent oracle mismatch.
            rounded = np.floor(sims * 1e6 + 0.5) / 1e6
            top = min(k, sims.shape[0])
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                idx = np.lexsort((c_ids, -rounded[:, j]))[:top]
                out_q.extend([qid] * len(idx))
                out_c.extend(c_ids[idx])
                out_s.extend(rounded[idx, j])
            yield pd.DataFrame({query_id: out_q, corpus_id: out_c, "cos_sim": out_s})

    scored = corpus.select(corpus_id, vec_col).mapInPandas(
        score, f"{query_id} long, {corpus_id} long, cos_sim double"
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("cos_sim", rnd(F.col("cos_sim"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def _pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    corpus_id: str,
    m: int,
    ksub: int,
) -> DataFrame:
    """Product-quantization codebooks: the vector splits into ``m``
    contiguous subvectors; each subspace gets ``ksub`` centroids via
    the same deterministic scheme as the IVF coarse quantizer
    (_centroids): seed with the ksub lowest-id subvectors, one Lloyd
    step. Returns (sub_j, code, cvec) with code = dense 0..ksub-1 rank
    of the seed order. Codebook size is m*ksub rows — broadcast
    everywhere, trained once per corpus snapshot at scale."""
    subs = corpus.orderBy(F.col(corpus_id).asc()).limit(ksub).select(
        F.col(corpus_id).alias("__sid"),
        _norm_unit(_as_double(F.col(vec_col))).alias("__v"),
    )
    dim_row = corpus.select(F.size(vec_col).alias("d")).limit(1).collect()[0]
    dsub = dim_row["d"] // m

    pieces = []
    for j in range(m):
        sl = F.slice(F.col("__v"), j * dsub + 1, dsub)
        pieces.append(
            subs.select(
                F.lit(j).alias("sub_j"), F.col("__sid").alias("__sid"), sl.alias("__seed")
            )
        )
    seeds = pieces[0]
    for p in pieces[1:]:
        seeds = seeds.unionByName(p)
    w = Window.partitionBy("sub_j").orderBy(F.col("__sid").asc())
    seeds = seeds.select(
        "sub_j", (F.row_number().over(w) - 1).alias("code"), F.col("__seed")
    )

    # one Lloyd step per subspace: assign every corpus subvector to its
    # nearest seed (L2), mean per (sub_j, code)
    corpus_subs = corpus.select(
        F.col(corpus_id).alias("__id"),
        _norm_unit(_as_double(F.col(vec_col))).alias("__v"),
    ).select(
        "__id",
        F.posexplode(
            F.array(*[F.slice(F.col("__v"), j * dsub + 1, dsub) for j in range(m)])
        ).alias("sub_j", "__sv"),
    )
    l2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        corpus_subs.join(F.broadcast(seeds), "sub_j")
        .withColumn("__d", l2(F.col("__sv"), F.col("__seed")))
        .groupBy("__id", "sub_j")
        .agg(
            F.min_by(
                F.struct(F.col("code"), F.col("__sv")),
                F.struct(F.col("__d"), F.col("code").alias("__tb")),
            ).alias("__best")
        )
        .select("sub_j", F.col("__best.code").alias("code"), F.col("__best.__sv").alias("__sv"))
    )
    comp = assigned.select(
        "sub_j", "code", F.posexplode("__sv").alias("pos", "val")
    )
    return (
        comp.groupBy("sub_j", "code", "pos")
        .agg(F.avg("val").alias("mval"))
        .groupBy("sub_j", "code")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mval"))),
                lambda s: s["mval"],
            ).alias("cvec")
        )
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 32,
) -> DataFrame:
    """Product-quantization approximate top-k: two-stage retrieve —
    ADC (asymmetric distance computation) over compressed codes, then
    EXACT cosine rerank of the ADC top-``rerank`` candidates (the
    standard PQ deployment: quantization collapses within-cell order,
    so raw ADC ranks clusters, and the rerank restores member order
    by touching only rerank/|corpus| of the real vectors).

    Corpus vectors compress to ``m`` one-byte codes (64x smaller at
    m=8 over 64-dim doubles) — at 100 TB the code table is what scans;
    the full vectors are fetched (join by id) for the tiny candidate
    set only.

    Plan shape: codebooks (m*ksub rows) and the per-query score table
    (queries x codebooks, also tiny) broadcast; the corpus encodes via
    one broadcast join + min_by aggregate, ADC scoring is a broadcast
    join on (sub_j, code) + one sum aggregate, and the rerank joins
    the candidate ids back to the corpus (broadcast-sized candidate
    set). Rows-only in the registry (seeded codebooks are not
    SQL-portable); recall vs exact is unit-tested on clustered data
    like IVF/LSH.
    """
    books = F.broadcast(_pq_codebooks(corpus, vec_col, corpus_id, m, ksub))
    dim_row = corpus.select(F.size(vec_col).alias("d")).limit(1).collect()[0]
    dsub = dim_row["d"] // m

    l2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # encode corpus: nearest codebook entry per subspace
    corpus_subs = corpus.select(
        F.col(corpus_id).alias("__cid"),
        _norm_unit(_as_double(F.col(vec_col))).alias("__v"),
    ).select(
        "__cid",
        F.posexplode(
            F.array(*[F.slice(F.col("__v"), j * dsub + 1, dsub) for j in range(m)])
        ).alias("sub_j", "__sv"),
    )
    codes = (
        corpus_subs.join(books, "sub_j")
        .withColumn("__d", l2(F.col("__sv"), F.col("cvec")))
        .groupBy("__cid", "sub_j")
        .agg(
            F.min_by(
                F.col("code"), F.struct(F.col("__d"), F.col("code").alias("__tb"))
            ).alias("code")
        )
    )
    # per-query ADC table: dot(query_subvector, codebook entry)
    qsubs = queries.select(
        F.col(query_id).alias("__qid"),
        _norm_unit(_as_double(F.col(vec_col))).alias("__q"),
    ).select(
        "__qid",
        F.posexplode(
            F.array(*[F.slice(F.col("__q"), j * dsub + 1, dsub) for j in range(m)])
        ).alias("sub_j", "__qsv"),
    )
    table = F.broadcast(
        qsubs.join(books, "sub_j").select(
            "__qid",
            "sub_j",
            "code",
            dot(F.col("__qsv"), F.col("cvec")).alias("__pdot"),
        )
    )
    scored = (
        codes.join(table, ["sub_j", "code"])
        .groupBy("__qid", "__cid")
        .agg(rnd(F.sum("__pdot"), 6).alias("adc_score"))
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("adc_score").desc(), F.col("__cid").asc()
    )
    candidates = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= max(rerank, k))
        .select("__qid", "__cid")
    )
    # exact rerank of the candidate set only
    exact = (
        F.broadcast(candidates)
        .join(
            corpus.select(
                F.col(corpus_id).alias("__cid"), F.col(vec_col).alias("__cv")
            ),
            "__cid",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qv")
                )
            ),
            "__qid",
        )
        .select(
            "__qid",
            "__cid",
            rnd(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("__qid").orderBy(
        F.col("cos_sim").desc(), F.col("__cid").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


def _norm_unit(vec: Column) -> Column:
    """L2-normalize (so PQ's ADC dot approximates cosine).

    The norm is zipped in via ``array_repeat(n, size(vec))`` instead
    of referenced inside a ``transform`` lambda: a lambda body's free
    subexpressions are re-evaluated PER ELEMENT (the quantized_topk
    O(dim^2) lesson, round 10), while a zip argument is evaluated once
    per row — this form stays O(dim) under any optimizer collapse."""
    n = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    return F.zip_with(
        vec, F.array_repeat(n, F.size(vec)), lambda x, nn: x / nn
    )
