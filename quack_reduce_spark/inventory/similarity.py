"""Similarity-search inventory over the embeddings table (north-star).

sim_cosine_topk (exact brute force) has a DuckDB oracle
(list_dot_product-based cosine, identical formula + rounding + rank
tiebreak), sim_ivf_topk's whole index build is SQL-replayed, and
sim_lsh_topk_portable hash-gates multi-probe LSH with md5-parity
planes. The seeded-Gaussian production sim_lsh_topk stays rows-only;
its recall vs brute force is unit-tested.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from quack_reduce_spark.inventory._util import load, rnd
from quack_reduce_spark.operators import similarity as S

EMBED_DIM = 64
N_QUERIES = 5
TOP_K = 5


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select("vec_id", "embedding")
    return queries, corpus


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for the first 5 vectors as queries."""
    queries, corpus = _split(spark, sf_dir)
    return S.cosine_topk(queries, corpus, k=TOP_K)


FILTERED_LABEL = 1  # the metadata slice for hybrid (filtered) search


def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search (round 11): exact cosine top-5 restricted to a
    METADATA slice of the corpus (label = 1) — the
    vector-search-with-filters shape every production retrieval stack
    runs (pre-filtered ANN). The filter composes BEFORE the distance
    pass, so at scale the predicate prunes the scan (pushdown /
    zone maps on the metadata column) and the O(q x n) scoring runs
    over the slice only — filtering after top-k would both cost the
    full scan and UNDER-fill results. Hash-oracled: DuckDB replays the
    same slice + scoring + ranking."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("label") == FILTERED_LABEL)
    ).select("vec_id", "embedding")
    return S.cosine_topk(queries, corpus, k=TOP_K)


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed approximate top-5 (rows-only driver check;
    recall vs brute force asserted in tests/test_similarity.py)."""
    queries, corpus = _split(spark, sf_dir)
    return S.lsh_topk(queries, corpus, dim=EMBED_DIM, k=TOP_K)


def sim_label_centroid_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean-vector norm — array aggregate over groups, fully
    JVM-side: aggregate component sums via posexplode + groupBy."""
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    ).select("label", "pos", F.col("val").cast("double").alias("val"))
    centroid = comp.groupBy("label", "pos").agg(
        F.avg("val").alias("mean_val"), F.count(F.lit(1)).alias("n")
    )
    return (
        centroid.groupBy("label")
        .agg(
            rnd(F.sqrt(F.sum(F.col("mean_val") * F.col("mean_val"))), 6).alias("centroid_norm"),
            F.max("n").alias("n_vectors"),
        )
    )


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-5: coarse-quantize the corpus into 16
    cells (deterministic seeds + one Lloyd step), probe the 4 nearest
    cells per query, exact rerank inside. FULLY HASH-ORACLED: the
    index build, probes, and rerank are replayed step-for-step in SQL
    (_ivf_oracle) — IVF has no seeded RNG, so 'approximate' never
    meant 'unverifiable'. Recall vs brute force additionally asserted
    in tests/test_similarity.py."""
    queries, corpus = _split(spark, sf_dir)
    return S.ivf_topk(queries, corpus, k=TOP_K, nlist=16, nprobe=4)


def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-scalar-quantized dot-product top-5 (the bandwidth-scale
    path: 4x smaller vectors; integer dots). Exact same half-up-floor
    quantization in the DuckDB oracle, so this is hash-checked, not
    rows-only."""
    queries, corpus = _split(spark, sf_dir)
    return S.quantized_topk(queries, corpus, k=TOP_K)


def sim_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification over the labeled embeddings:
    per-label mean vectors (posexplode + avg, rebuilt as arrays), each
    vector assigned to its max-cosine centroid, per-label accuracy
    reported. The centroid table is tiny and broadcast; the corpus is
    scanned once — the evaluation-loop shape of embedding-space
    labeling jobs."""
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    ).select("label", "pos", F.col("val").cast("double").alias("val"))
    cent = (
        comp.groupBy("label", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cvec")
        )
        .select(F.col("label").alias("clabel"), "cvec")
    )
    from quack_reduce_spark.operators.similarity import cosine

    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "clabel",
        # rounded before ranking so a last-ulp cosine gap between the
        # two engines cannot flip the argmax at a centroid near-tie
        rnd(cosine(F.col("embedding"), F.col("cvec")), 6).alias("score"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("clabel").asc()
    )
    pred = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "label", F.col("clabel").alias("pred"))
    )
    return (
        pred.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("pred") == F.col("label")).alias("n_correct"),
            rnd(F.count_if(F.col("pred") == F.col("label")) / F.count(F.lit(1)), 6).alias(
                "accuracy"
            ),
        )
        .orderBy("label")
    )


def sim_cosine_topk_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 through the VECTORIZED kernel path
    (mapInPandas + numpy BLAS matmul, operators/similarity.py:
    cosine_topk_vectorized) — the Arrow-batched Python lane for dense
    numeric kernels. HASH-ORACLED on the (query_id, vec_id, rank)
    projection: the kernel rounds scores to 1e-6 with a vec_id
    tiebreak before ranking, so the neighbor ids and their order are
    engine-exact even though numpy's pairwise-summed raw score can
    differ from SQL's fold in the last ulp (the score column itself
    stays out of the hash for exactly that reason; full-row id-set
    equality vs the JVM exact path is additionally asserted in
    tests/test_similarity.py)."""
    queries, corpus = _split(spark, sf_dir)
    return S.cosine_topk_vectorized(spark, queries, corpus, k=TOP_K).select(
        "query_id", "vec_id", "rank"
    )


def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization two-stage top-5 (ADC over 8x16 codebooks,
    exact rerank of the ADC top-32): the compression-based ANN scale
    path — at 100 TB the 8-byte code table scans instead of the full
    vectors, which are fetched for the candidate set only. FULLY
    HASH-ORACLED (_pq_oracle): codebook training, corpus encoding,
    ADC tables, candidate cut, and exact rerank are all replayed in
    SQL — 'seeded' always meant lowest-id, never RNG. Recall vs
    exact additionally unit-tested on clustered data in
    tests/test_similarity.py."""
    queries, corpus = _split(spark, sf_dir)
    return S.pq_topk(queries, corpus, k=TOP_K, m=8, ksub=16, rerank=32)


def sim_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full iterative spherical k-means (k=8) over the embeddings
    table, reported as per-cluster size/cohesion profile
    (operators/clustering.py). Deterministic (seeded init + fixed
    tiebreaks) but iterative-fixpoint, so non-SQL-expressible:
    rows-only driver check + planted-cluster recovery tests in
    tests/test_clustering.py."""
    from quack_reduce_spark.operators.clustering import kmeans_profile

    emb = load(spark, sf_dir, "embeddings")
    return kmeans_profile(emb, corpus_id="vec_id", vec_col="embedding", k=8)


PCA_ROUNDS = 3


def sim_pca_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most extreme projections onto the corpus's first
    principal component (operators/pca.py: centered fixed-round power
    iteration, deterministic init ⇒ deterministic sign). The
    anisotropy readout of an embedding table — these are the rows that
    dominate any un-whitened cosine ranking. Every score is
    hash-oracled against a 3-round unrolled-SQL replay of the same
    iteration."""
    from quack_reduce_spark.operators.pca import pca_scores

    emb = load(spark, sf_dir, "embeddings")
    scores = pca_scores(emb, "vec_id", "embedding", dim=EMBED_DIM, rounds=PCA_ROUNDS)
    return (
        scores.join(emb.select("vec_id", "label"), "vec_id")
        .select("vec_id", "label", rnd(F.col("score"), 6).alias("score"))
        .orderBy(F.abs(F.col("score")).desc(), F.col("vec_id").asc())
        .limit(20)
    )


def sim_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy report of the embedding table: total centered
    variance vs variance along the power-iterated top component, and
    the ratio. THE diagnostic for 'is raw cosine similarity here
    dominated by one direction' (the all-but-the-top phenomenon);
    oracled against the same unrolled-SQL power iteration as
    sim_pca_topk."""
    from quack_reduce_spark.operators.pca import pca_variance_profile

    emb = load(spark, sf_dir, "embeddings")
    prof = pca_variance_profile(
        emb, "vec_id", "embedding", dim=EMBED_DIM, rounds=PCA_ROUNDS
    )
    return prof.select(
        "n_vectors",
        rnd(F.col("var_total"), 6).alias("var_total"),
        rnd(F.col("var_top"), 6).alias("var_top"),
        rnd(F.col("var_top") / F.col("var_total"), 6).alias("top_share"),
    )


def _pca_oracle(dim: int = EMBED_DIM, rounds: int = PCA_ROUNDS) -> str:
    """Unrolled-SQL replay of the power iteration. v0 = 1/sqrt(dim)
    (0.125 for d=64 — exactly representable, so both engines start
    from the identical double)."""
    v0 = 1.0 / math.sqrt(dim)
    parts = [
        f"""
        WITH e AS (
            SELECT vec_id, s.i AS pos,
                   CAST(embedding[s.i] AS DOUBLE) AS val
            FROM embeddings CROSS JOIN generate_series(1, {dim}) AS s(i)
        ),
        mu AS (SELECT pos, AVG(val) AS m FROM e GROUP BY pos),
        c AS (
            SELECT e.vec_id, e.pos, e.val - mu.m AS cv
            FROM e JOIN mu USING (pos)
        ),
        s1 AS (
            SELECT vec_id, SUM(cv * {v0!r}) AS s FROM c GROUP BY vec_id
        )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f""",
        w{r} AS (
            SELECT c.pos, SUM(c.cv * s{r}.s) AS w
            FROM c JOIN s{r} USING (vec_id) GROUP BY c.pos
        ),
        n{r} AS (SELECT SQRT(SUM(w * w)) AS n FROM w{r}),
        v{r} AS (SELECT pos, w / (SELECT n FROM n{r}) AS v FROM w{r})""")
        if r < rounds:
            parts.append(f""",
        s{r + 1} AS (
            SELECT c.vec_id, SUM(c.cv * v{r}.v) AS s
            FROM c JOIN v{r} USING (pos) GROUP BY c.vec_id
        )""")
    parts.append(f""",
        score AS (
            SELECT c.vec_id, SUM(c.cv * v{rounds}.v) AS sc
            FROM c JOIN v{rounds} USING (pos) GROUP BY c.vec_id
        ),
        rounded AS (
            SELECT score.vec_id, emb.label,
                   FLOOR(score.sc * 1e6 + 0.5) / 1e6 AS score
            FROM score JOIN embeddings emb ON score.vec_id = emb.vec_id
        )
        SELECT vec_id, label, score FROM rounded
        ORDER BY ABS(score) DESC, vec_id ASC
        LIMIT 20""")
    return "".join(parts)


def _pca_variance_oracle(dim: int = EMBED_DIM, rounds: int = PCA_ROUNDS) -> str:
    """Same unrolled iteration, variance-profile readout."""
    base = _pca_oracle(dim, rounds)
    # reuse everything up to (and including) v{rounds}, swap the readout
    cut = base.index(",\n        score AS (")
    return base[:cut] + f""",
        prof AS (
            SELECT c.vec_id,
                   SUM(c.cv * v{rounds}.v) AS s,
                   SUM(c.cv * c.cv) AS sq
            FROM c JOIN v{rounds} USING (pos) GROUP BY c.vec_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
               FLOOR(AVG(sq) * 1e6 + 0.5) / 1e6 AS var_total,
               FLOOR(AVG(s * s) * 1e6 + 0.5) / 1e6 AS var_top,
               FLOOR((AVG(s * s) / AVG(sq)) * 1e6 + 0.5) / 1e6 AS top_share
        FROM prof"""


def _pq_oracle(
    m: int = 8, ksub: int = 16, rerank: int = 32, k: int = TOP_K
) -> str:
    """Full SQL replay of sim_pq_topk: codebook training (lowest-id
    seeds per subspace → L2 argmin assignment → Lloyd mean), corpus
    encoding to m codes, per-query ADC tables, top-``rerank`` ADC
    candidates, exact-cosine rerank. PQ has no RNG — 'seeded' means
    lowest-id — so the entire compressed-retrieval path is
    hash-gated. list_distance (an sqrt of the Spark side's raw
    squared sum) is order-equivalent, so every argmin matches."""
    dsub = EMBED_DIM // m
    return f"""
        WITH craw AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id >= {N_QUERIES}
        ),
        qraw AS (
            SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        cn AS (
            SELECT cid,
                   list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                       AS u
            FROM craw
        ),
        qn AS (
            SELECT qid,
                   list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                       AS u
            FROM qraw
        ),
        subs AS (SELECT j FROM generate_series(0, {m - 1}) s(j)),
        cs AS (
            SELECT cid, s.j AS sub_j,
                   u[(s.j * {dsub} + 1):(s.j * {dsub} + {dsub})] AS sv
            FROM cn, subs s
        ),
        seeds AS (
            SELECT sub_j, code, sv AS seed FROM (
                SELECT cs.sub_j, cs.sv,
                       row_number() OVER (PARTITION BY cs.sub_j
                                          ORDER BY cs.cid ASC) - 1 AS code
                FROM cs
                WHERE cs.cid IN (SELECT cid FROM craw
                                 ORDER BY cid LIMIT {ksub})
            )
        ),
        a0 AS (
            SELECT sub_j, code, sv FROM (
                SELECT cs.sub_j, sd.code, cs.sv,
                       row_number() OVER (
                           PARTITION BY cs.cid, cs.sub_j
                           ORDER BY list_distance(cs.sv, sd.seed) ASC,
                                    sd.code ASC) AS rk
                FROM cs JOIN seeds sd ON cs.sub_j = sd.sub_j
            ) WHERE rk = 1
        ),
        cent AS (
            SELECT sub_j, code, i.i AS pos, AVG(sv[i.i]) AS mval
            FROM a0 CROSS JOIN generate_series(1, {dsub}) AS i(i)
            GROUP BY sub_j, code, i.i
        ),
        books AS (
            SELECT sub_j, code, list(mval ORDER BY pos) AS cvec
            FROM cent GROUP BY sub_j, code
        ),
        codes AS (
            SELECT cid, sub_j, code FROM (
                SELECT cs.cid, cs.sub_j, b.code,
                       row_number() OVER (
                           PARTITION BY cs.cid, cs.sub_j
                           ORDER BY list_distance(cs.sv, b.cvec) ASC,
                                    b.code ASC) AS rk
                FROM cs JOIN books b ON cs.sub_j = b.sub_j
            ) WHERE rk = 1
        ),
        qsubs AS (
            SELECT qid, s.j AS sub_j,
                   u[(s.j * {dsub} + 1):(s.j * {dsub} + {dsub})] AS qsv
            FROM qn, subs s
        ),
        adc_table AS (
            SELECT q.qid, q.sub_j, b.code,
                   list_dot_product(q.qsv, b.cvec) AS pdot
            FROM qsubs q JOIN books b ON q.sub_j = b.sub_j
        ),
        scored AS (
            SELECT t.qid, c.cid,
                   FLOOR(SUM(t.pdot) * 1e6 + 0.5) / 1e6 AS adc
            FROM codes c
            JOIN adc_table t ON c.sub_j = t.sub_j AND c.code = t.code
            GROUP BY t.qid, c.cid
        ),
        cand AS (
            SELECT qid, cid FROM (
                SELECT qid, cid,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY adc DESC, cid ASC) AS r
                FROM scored
            ) WHERE r <= {max(rerank, k)}
        ),
        exact AS (
            SELECT cand.qid AS query_id, cand.cid AS vec_id,
                   FLOOR((list_dot_product(qe.v, ce.v)
                          / (sqrt(list_dot_product(qe.v, qe.v))
                             * sqrt(list_dot_product(ce.v, ce.v))))
                         * 1e6 + 0.5) / 1e6 AS cos_sim
            FROM cand
            JOIN qraw qe ON qe.qid = cand.qid
            JOIN craw ce ON ce.cid = cand.cid
        )
        SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos_sim DESC, vec_id ASC) AS rank
            FROM exact
        ) WHERE rank <= {k}
    """


KMEANS_FIXED_K = 8


def sim_kmeans_fixed_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-ROUND spherical k-means profile, fully hash-oracled: seed
    with the k lowest-id vectors, one Lloyd step (the sim_ivf_topk
    index build), one final max-cosine assignment, then per-cluster
    size / mean-cosine / exemplar. The fixed round count is what makes
    the SQL replay possible (the pagerank/BFS/PCA trick applied to
    clustering); the CONVERGED variant sim_kmeans_profile stays
    rows-only — its round count is data-dependent by contract — with
    this query pinning the algebra both share."""
    from quack_reduce_spark.operators.similarity import (
        _centroids,
        cosine,
        dot,
        l2_norm,
    )

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding")
    cents = F.broadcast(_centroids(corpus, "embedding", KMEANS_FIXED_K, "vec_id"))
    assigned = (
        corpus.crossJoin(cents)
        .withColumn(
            "__d",
            dot(F.col("embedding"), F.col("__centroid"))
            / l2_norm(F.col("__centroid")),
        )
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct(
                    F.col("__cell"),
                    F.col("__centroid").alias("__cv"),
                    F.col("embedding").alias("__vec"),
                ),
                F.struct(F.col("__d"), (-F.col("__cell")).alias("__tb")),
            ).alias("__best")
        )
        .select(
            "vec_id",
            F.col("__best.__cell").alias("cell"),
            cosine(F.col("__best.__vec"), F.col("__best.__cv")).alias("__cos"),
        )
    )
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            rnd(F.avg("__cos"), 6).alias("avg_cos"),
            F.min("vec_id").alias("exemplar"),
        )
        .orderBy("cell")
    )


def _kmeans_fixed_oracle(k: int = KMEANS_FIXED_K) -> str:
    """Unrolled replay: seeds → plain-dot assign → Lloyd mean →
    cosine re-assign → profile (the _ivf_oracle CTE chain with a
    per-cluster readout instead of query probes)."""
    return f"""
        WITH c AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        seeds AS (
            SELECT cid AS cell, v AS sv FROM c ORDER BY cid LIMIT {k}
        ),
        a0 AS (
            SELECT cid, v, cell FROM (
                SELECT c.cid, c.v, s.cell,
                       row_number() OVER (
                           PARTITION BY c.cid
                           ORDER BY list_dot_product(c.v, s.sv) DESC,
                                    s.cell ASC) AS rk
                FROM c CROSS JOIN seeds s
            ) WHERE rk = 1
        ),
        cent AS (
            SELECT cell, i.i AS pos, AVG(v[i.i]) AS m
            FROM a0 CROSS JOIN generate_series(1, {EMBED_DIM}) AS i(i)
            GROUP BY cell, i.i
        ),
        centv AS (
            SELECT cell, list(m ORDER BY pos) AS cv FROM cent GROUP BY cell
        ),
        a1 AS (
            SELECT cid, cell,
                   list_dot_product(v, cv)
                   / (sqrt(list_dot_product(v, v))
                      * sqrt(list_dot_product(cv, cv))) AS cos
            FROM (
                SELECT c.cid, c.v, t.cell, t.cv,
                       row_number() OVER (
                           PARTITION BY c.cid
                           ORDER BY list_dot_product(c.v, t.cv)
                                    / sqrt(list_dot_product(t.cv, t.cv)) DESC,
                                    t.cell ASC) AS rk
                FROM c CROSS JOIN centv t
            ) WHERE rk = 1
        )
        SELECT cell,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               FLOOR(AVG(cos) * 1e6 + 0.5) / 1e6 AS avg_cos,
               MIN(cid) AS exemplar
        FROM a1
        GROUP BY cell
        ORDER BY cell
    """


LSH_TOPK_PLANES = 8


def sim_lsh_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH top-5 with md5-parity ±1 planes and
    integer-quantized projections — FULLY HASH-ORACLED (buckets,
    Hamming-≤1 probes, and exact-cosine rerank replayed in SQL).
    Companion to sim_lsh_topk, the seeded-Gaussian production variant
    (rows-only by design)."""
    queries, corpus = _split(spark, sf_dir)
    return S.lsh_topk_portable(
        queries, corpus, dim=EMBED_DIM, k=TOP_K, n_planes=LSH_TOPK_PLANES
    )



QUERIES = {
    "sim_cosine_topk": sim_cosine_topk,
    "sim_filtered_topk": sim_filtered_topk,
    "sim_pca_topk": sim_pca_topk,
    "sim_pca_variance": sim_pca_variance,
    "sim_cosine_topk_np": sim_cosine_topk_np,
    "sim_kmeans_profile": sim_kmeans_profile,
    "sim_kmeans_fixed_profile": sim_kmeans_fixed_profile,
    "sim_pq_topk": sim_pq_topk,
    "sim_nearest_centroid": sim_nearest_centroid,
    "sim_quantized_topk": sim_quantized_topk,
    "sim_lsh_topk": sim_lsh_topk,
    "sim_lsh_topk_portable": sim_lsh_topk_portable,
    "sim_ivf_topk": sim_ivf_topk,
    "sim_label_centroid_norm": sim_label_centroid_norm,
}


def _lsh_topk_portable_oracle(n_planes: int = LSH_TOPK_PLANES, k: int = TOP_K) -> str:
    offsets = ", ".join(
        f"({off})" for off in [0] + [1 << p for p in range(n_planes)]
    )
    return f"""
        WITH dims AS (SELECT i FROM generate_series(0, {EMBED_DIM - 1}) s(i)),
        planes AS (SELECT p FROM generate_series(0, {n_planes - 1}) s(p)),
        sgns AS (
            SELECT p, i,
                   CASE WHEN CAST('0x' || substring(
                            md5(CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
                            1, 2) AS INT) % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM planes, dims
        ),
        q AS (
            SELECT vec_id, d.i,
                   CAST(FLOOR(CAST(embedding[d.i + 1] AS DOUBLE) * 1e6 + 0.5)
                        AS BIGINT) AS xq
            FROM embeddings, dims d
        ),
        proj AS (
            SELECT q.vec_id, s.p, SUM(q.xq * s.sgn) AS pr
            FROM q JOIN sgns s ON q.i = s.i
            GROUP BY q.vec_id, s.p
        ),
        buckets AS (
            SELECT vec_id,
                   CAST(SUM(CASE WHEN pr > 0 THEN (1 << p) ELSE 0 END)
                        AS BIGINT) AS bucket
            FROM proj GROUP BY vec_id
        ),
        e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS n
            FROM embeddings
        ),
        probes AS (
            SELECT b.vec_id AS qid, xor(b.bucket, o.off) AS bucket
            FROM buckets b CROSS JOIN (VALUES {offsets}) AS o(off)
            WHERE b.vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT p.qid AS query_id, c.vec_id,
                   FLOOR((list_dot_product(qe.v, ce.v) / (qe.n * ce.n))
                         * 1e6 + 0.5) / 1e6 AS cos_sim
            FROM probes p
            JOIN buckets c ON c.bucket = p.bucket
                          AND c.vec_id >= {N_QUERIES}
            JOIN e qe ON qe.vec_id = p.qid
            JOIN e ce ON ce.vec_id = c.vec_id
        )
        SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos_sim DESC, vec_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def _ivf_oracle(nlist: int = 16, nprobe: int = 4, k: int = TOP_K) -> str:
    """Full SQL replay of sim_ivf_topk: the INDEX BUILD (lowest-id
    seeds → plain-dot argmax assignment → one Lloyd mean step) and the
    probe/rerank both reproduced step for step. IVF here has no seeded
    RNG — its determinism was always total — so the 'approximate' ANN
    path is hash-gated end to end, not rows-only."""
    return f"""
        WITH q AS (
            SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        c AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id >= {N_QUERIES}
        ),
        seeds AS (
            SELECT cid AS cell, v AS sv FROM c ORDER BY cid LIMIT {nlist}
        ),
        a0 AS (
            SELECT cid, v, cell FROM (
                SELECT c.cid, c.v, s.cell,
                       row_number() OVER (
                           PARTITION BY c.cid
                           ORDER BY list_dot_product(c.v, s.sv) DESC,
                                    s.cell ASC) AS rk
                FROM c CROSS JOIN seeds s
            ) WHERE rk = 1
        ),
        cent AS (
            SELECT cell, i.i AS pos, AVG(v[i.i]) AS m
            FROM a0 CROSS JOIN generate_series(1, {EMBED_DIM}) AS i(i)
            GROUP BY cell, i.i
        ),
        centv AS (
            SELECT cell, list(m ORDER BY pos) AS cv FROM cent GROUP BY cell
        ),
        a1 AS (
            SELECT cid, v, cell FROM (
                SELECT c.cid, c.v, t.cell,
                       row_number() OVER (
                           PARTITION BY c.cid
                           ORDER BY list_dot_product(c.v, t.cv)
                                    / sqrt(list_dot_product(t.cv, t.cv)) DESC,
                                    t.cell ASC) AS rk
                FROM c CROSS JOIN centv t
            ) WHERE rk = 1
        ),
        probes AS (
            SELECT qid, qv, cell FROM (
                SELECT q.qid, q.v AS qv, t.cell,
                       row_number() OVER (
                           PARTITION BY q.qid
                           ORDER BY list_dot_product(q.v, t.cv)
                                    / sqrt(list_dot_product(t.cv, t.cv)) DESC,
                                    t.cell ASC) AS rk
                FROM q CROSS JOIN centv t
            ) WHERE rk <= {nprobe}
        ),
        scored AS (
            SELECT p.qid AS query_id, a.cid AS vec_id,
                   FLOOR((list_dot_product(p.qv, a.v)
                          / (sqrt(list_dot_product(p.qv, p.qv))
                             * sqrt(list_dot_product(a.v, a.v))))
                         * 1e6 + 0.5) / 1e6 AS cos_sim
            FROM probes p JOIN a1 a ON p.cell = a.cell
        )
        SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos_sim DESC, vec_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


ORACLES = {
    "sim_ivf_topk": _ivf_oracle(),
    "sim_pq_topk": _pq_oracle(),
    "sim_kmeans_fixed_profile": _kmeans_fixed_oracle(),
    "sim_lsh_topk_portable": _lsh_topk_portable_oracle(),
    "sim_pca_topk": _pca_oracle(),
    "sim_pca_variance": _pca_variance_oracle(),
    "sim_nearest_centroid": """
        WITH comp AS (
            SELECT label, s.i AS pos, AVG(CAST(embedding[s.i] AS DOUBLE)) AS m
            FROM embeddings CROSS JOIN generate_series(1, 64) AS s(i)
            GROUP BY label, s.i
        ),
        cent AS (
            SELECT label AS clabel, list(m ORDER BY pos) AS cvec
            FROM comp GROUP BY label
        ),
        scored AS (
            SELECT e.vec_id, e.label, c.clabel,
                   FLOOR((list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
                   / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(c.cvec, c.cvec))))
                      * 1e6 + 0.5) / 1e6 AS score
            FROM embeddings e CROSS JOIN cent c
        ),
        pred AS (
            SELECT vec_id, label, clabel AS pred,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY score DESC, clabel ASC) AS rk
            FROM scored
            QUALIFY rk = 1
        )
        SELECT label,
               COUNT(*) AS n,
               CAST(count_if(pred = label) AS BIGINT) AS n_correct,
               FLOOR((CAST(count_if(pred = label) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS accuracy
        FROM pred
        GROUP BY label
        ORDER BY label
    """,
    "sim_quantized_topk": f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        quant AS (
            SELECT vec_id,
                   greatest(list_max(list_transform(v, x -> abs(x))) / 127.0, 1e-12) AS s,
                   list_transform(v,
                       x -> floor(x / greatest(list_max(list_transform(v, y -> abs(y))) / 127.0, 1e-12) + 0.5)) AS q
            FROM base
        ),
        scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                   FLOOR((a.s * b.s * list_dot_product(a.q, b.q)) * 1e6 + 0.5) / 1e6 AS approx_dot
            FROM quant a, quant b
            WHERE a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}
        )
        SELECT query_id, vec_id, approx_dot, CAST(rank AS INT) AS rank
        FROM (
            SELECT query_id, vec_id, approx_dot,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY approx_dot DESC, vec_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= {TOP_K}
    """,
    "sim_cosine_topk": f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings WHERE vec_id >= {N_QUERIES}
        ),
        scored AS (
            SELECT query_id, vec_id,
                   FLOOR((list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))) * 1e6 + 0.5) / 1e6 AS cos_sim
            FROM q, c
        )
        SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
        FROM (
            SELECT query_id, vec_id, cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, vec_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= {TOP_K}
    """,
    # hybrid (metadata-filtered) exact search: same scoring, sliced corpus
    "sim_filtered_topk": f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings
            WHERE vec_id >= {N_QUERIES} AND label = {FILTERED_LABEL}
        ),
        scored AS (
            SELECT query_id, vec_id,
                   FLOOR((list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))) * 1e6 + 0.5) / 1e6 AS cos_sim
            FROM q, c
        )
        SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
        FROM (
            SELECT query_id, vec_id, cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, vec_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= {TOP_K}
    """,
    # the numpy-kernel variant oracles the id/rank projection only —
    # scores round to 1e-6 before ranking in both engines, making the
    # neighbor ids and their order exact, while the raw float stays out
    # of the hash (BLAS pairwise summation vs SQL fold last-ulp noise)
    "sim_cosine_topk_np": f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings WHERE vec_id >= {N_QUERIES}
        ),
        scored AS (
            SELECT query_id, vec_id,
                   FLOOR((list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))) * 1e6 + 0.5) / 1e6 AS cos_sim
            FROM q, c
        )
        SELECT query_id, vec_id, CAST(rank AS INT) AS rank
        FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, vec_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= {TOP_K}
    """,
    "sim_label_centroid_norm": """
        WITH comp AS (
            SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
            FROM embeddings, generate_series(1, 64) t(i)
        ),
        centroid AS (
            SELECT label, pos, AVG(val) AS mean_val, COUNT(*) AS n
            FROM comp GROUP BY label, pos
        )
        SELECT label,
               FLOOR((SQRT(SUM(mean_val * mean_val))) * 1e6 + 0.5) / 1e6 AS centroid_norm,
               MAX(n) AS n_vectors
        FROM centroid GROUP BY label
    """,
}
