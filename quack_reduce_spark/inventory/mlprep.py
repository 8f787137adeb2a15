"""ML data-preparation inventory: deterministic splits, k-fold
assignment, feature hashing, equi-depth binning, standardization,
and class weighting.

These are the operations between "curated corpus" and "training run":
every one is expressed as pure DataFrame algebra (no RNG, no driver
loops) so the same code yields the same assignment on any cluster
size — the property a 100 TB pipeline actually needs from its split
step. The reference delegates this surface to ad-hoc client SQL
(reference ``app.py:51`` runs arbitrary DuckDB statements); here each
op is a named, oracle-gated query.

Cross-engine hash discipline: split/fold assignment hashes the row key
with ``md5`` (identical bytes in Spark and DuckDB) and converts the
first 8 hex chars to an integer — Spark ``conv(substring(md5(k),1,8),
16,10)``, DuckDB ``CAST('0x' || substring(md5(k),1,8) AS BIGINT)`` —
so the oracle replays the exact assignment, not a statistical
approximation. At 100 TB the hash is a narrow projection computed
inside the scan; no shuffle is needed until the per-split aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load, rnd


def _md5_bucket(key, mod: int):
    """Deterministic integer bucket from a string column: first 32
    bits of md5, mod `mod`. Portable to any engine with md5().
    Bucket uniformity, split-fraction accuracy, and key-range
    independence property-tested: tests/test_properties.py
    ``test_feature_hash_buckets_uniform_and_order_free`` /
    ``test_train_split_fractions_and_key_range_independence``."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % mod


def _md5_bucket_sql(key_sql: str, mod: int) -> str:
    return f"CAST('0x' || substring(md5({key_sql}), 1, 8) AS BIGINT) % {mod}"


def ml_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split of the documents corpus by
    content-independent key hash, with per-(split, source) counts and
    length stats. Hash-of-key (not ``df.sample``) keeps the assignment
    stable under repartitioning, backfill, and cluster resizing —
    ``randomSplit`` re-deals rows whenever the partition layout
    changes, which silently leaks eval docs into train."""
    docs = load(spark, sf_dir, "documents")
    b = _md5_bucket(F.col("doc_id").cast("string"), 100)
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            rnd(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split", "source")
    )


def ml_kfold_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation assignment over customers with a
    per-fold balance audit (row count, mean balance, distinct
    segments). The audit IS the point: hash-folding is only valid if
    the folds come out statistically interchangeable, and this query
    is the check a pipeline runs before trusting CV numbers."""
    cust = load(spark, sf_dir, "customer")
    fold = _md5_bucket(F.col("c_custkey").cast("string"), 5)
    return (
        cust.withColumn("fold", fold)
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            rnd(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.count_distinct("c_mktsegment").alias("n_segments"),
        )
        .orderBy("fold")
    )


def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words: tokenize, hash every token into 256
    buckets, aggregate term frequency and document frequency per
    bucket, return the 20 heaviest buckets. The fixed-width feature
    space is what makes vocabulary-free vectorization possible at
    100 TB — no vocab broadcast, no OOV handling, one explode + one
    aggregate, and the bucket id is computed inside the scan
    projection."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
    ).filter(F.col("term") != "")
    return (
        tok.withColumn("bucket", _md5_bucket(F.col("term"), 256))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("bucket").asc())
        .limit(20)
    )


def ml_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width discretization of order totalprice into 10 bins:
    fit (min, max) in one scalar aggregate, broadcast the two edges,
    bucket arithmetically inside the scan, aggregate per bin. No sort
    anywhere — deliberately NOT ntile(), whose single unpartitioned
    Window funnels the whole table through one task (the same
    scale-killer operators/zorder.py:35 removed in favor of
    approxQuantile edges; equi-DEPTH binning at scale goes through
    that quantile-edge path, which is sketch-based and therefore not
    oracle-replayable)."""
    orders = load(spark, sf_dir, "orders")
    edges = orders.agg(
        F.min("o_totalprice").alias("lo_all"),
        F.max("o_totalprice").alias("hi_all"),
    )
    raw = F.floor(
        (F.col("o_totalprice") - F.col("lo_all"))
        / (F.col("hi_all") - F.col("lo_all"))
        * F.lit(10.0)
    )
    bin_ = F.least(raw, F.lit(9)).cast("long")
    return (
        orders.crossJoin(F.broadcast(edges))
        .withColumn("bin", bin_)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            rnd(F.min("o_totalprice"), 2).alias("lo"),
            rnd(F.max("o_totalprice"), 2).alias("hi"),
            rnd(F.avg("o_totalprice"), 4).alias("mean_price"),
        )
        .orderBy("bin")
    )


def ml_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score standardization: fit (mean, stddev) in one aggregate,
    broadcast the two scalars back over the table, return the 15 most
    extreme customers. Fit-then-transform as a broadcast join — never
    a window over an unpartitioned sort — is the shape that survives
    100 TB; the fit side is a single row regardless of input size."""
    cust = load(spark, sf_dir, "customer")
    stats = cust.agg(
        F.avg("c_acctbal").alias("mu"),
        F.stddev_samp("c_acctbal").alias("sigma"),
    )
    z = (F.col("c_acctbal") - F.col("mu")) / F.col("sigma")
    return (
        cust.crossJoin(F.broadcast(stats))
        .select(
            "c_custkey",
            rnd(F.col("c_acctbal"), 2).alias("acctbal"),
            rnd(z, 6).alias("zscore"),
        )
        .orderBy(F.abs(F.col("zscore")).desc(), F.col("c_custkey").asc())
        .limit(15)
    )


def ml_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn 'balanced' formula:
    n_total / (n_classes * n_class)) for the market-segment label.
    Two tiny aggregates and a broadcast of one scalar row — the
    weight table itself is then broadcast-joinable onto any fact."""
    cust = load(spark, sf_dir, "customer")
    per = cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_class"))
    tot = per.agg(
        F.sum("n_class").alias("n_total"),
        F.count(F.lit(1)).alias("n_classes"),
    )
    w = F.col("n_total") / (F.col("n_classes") * F.col("n_class"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            F.col("n_class"),
            rnd(w, 6).alias("weight"),
        )
        .orderBy("c_mktsegment")
    )


def ml_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized outlier clipping: fit exact p01/p99 of order
    totalprice (one aggregate; F.percentile and DuckDB quantile_cont
    share the linear-interpolation definition, so the cut points are
    engine-identical — the text_adaptive_gate precedent), broadcast
    the two scalars, clip in the scan projection, and report
    before/after stats plus clip counts. At 100 TB the exact
    percentile swaps for percentile_approx with the same downstream
    shape."""
    orders = load(spark, sf_dir, "orders")
    cuts = orders.agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.01)).alias("p01"),
        F.percentile(F.col("o_totalprice"), F.lit(0.99)).alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("p01")), F.col("p99"))
    return (
        orders.crossJoin(F.broadcast(cuts))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("o_totalprice") < F.col("p01")).alias("n_clipped_lo"),
            F.count_if(F.col("o_totalprice") > F.col("p99")).alias("n_clipped_hi"),
            rnd(F.first("p01"), 4).alias("p01"),
            rnd(F.first("p99"), 4).alias("p99"),
            rnd(F.avg("o_totalprice"), 4).alias("mean_raw"),
            rnd(F.avg(clipped), 4).alias("mean_winsorized"),
        )
    )


def ml_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/IQR robust scaling per market segment: fit (median,
    IQR) per class in one grouped aggregate, broadcast the 5-row fit
    table back, and report the scaled extremes per segment. Robust
    scaling is what survives the heavy-tailed value columns a web
    corpus actually has — mean/std (ml_standardize) is one fat outlier
    away from useless."""
    cust = load(spark, sf_dir, "customer")
    fit = cust.groupBy("c_mktsegment").agg(
        F.percentile(F.col("c_acctbal"), F.lit(0.5)).alias("med"),
        (
            F.percentile(F.col("c_acctbal"), F.lit(0.75))
            - F.percentile(F.col("c_acctbal"), F.lit(0.25))
        ).alias("iqr"),
    )
    scaled = (F.col("c_acctbal") - F.col("med")) / F.col("iqr")
    return (
        cust.join(F.broadcast(fit), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            rnd(F.first("med"), 4).alias("median"),
            rnd(F.first("iqr"), 4).alias("iqr"),
            rnd(F.min(scaled), 6).alias("scaled_min"),
            rnd(F.max(scaled), 6).alias("scaled_max"),
        )
        .orderBy("c_mktsegment")
    )


NEG_K = 4  # negatives per anchor


def ml_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negative sampling: for every anchor doc (1 in 25),
    derive K pseudo-random negative partners with pure integer
    arithmetic — neg = (anchor + j·stride) mod N, stride a per-anchor
    md5 hash in [1, N-1] — then join back to prove each negative
    exists and carry its source. No RNG: the same anchor gets the
    same negatives on any cluster, any partitioning, any rerun, which
    is what makes contrastive training reproducible AND resumable
    (re-deriving epoch e's pairs after a crash needs only e, not a
    saved RNG state). Corpus size N is a one-row aggregate broadcast
    into the projection; the only shuffle is the join back to the
    documents table on the derived key."""
    docs = load(spark, sf_dir, "documents")
    n_tbl = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    anchors = (
        docs.filter(F.col("doc_id") % 25 == 0)
        .crossJoin(F.broadcast(n_tbl))
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.col("source").alias("anchor_source"),
            "n_docs",
            (
                _md5_bucket(F.col("doc_id").cast("string"), 997) % (F.col("n_docs") - 1)
                + 1
            ).alias("stride"),
        )
    )
    pairs = anchors.select(
        "anchor_id",
        "anchor_source",
        F.explode(F.sequence(F.lit(1), F.lit(NEG_K))).alias("j"),
        F.pmod(F.col("anchor_id") + F.col("j") * F.col("stride"), F.col("n_docs")).alias(
            "neg_id"
        ),
    ).filter(F.col("neg_id") != F.col("anchor_id"))
    return (
        pairs.join(
            docs.select(F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")),
            "neg_id",
        )
        .select("anchor_id", "anchor_source", "j", "neg_id", "neg_source")
        .orderBy("anchor_id", "j")
    )


def ml_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, per
    stratum — the mixture-construction primitive (sample 5 docs per
    source, probability proportional to length) as Efraimidis-
    Spirakis A-ES: each doc draws u in (0,1) from its key's md5 (not
    an RNG — stable under repartitioning, backfill, resume, exactly
    like the split/fold hashing above) and is ranked by the key
    ``u^(1/w)``; the per-stratum top-n IS a weight-proportional
    sample without replacement (Efraimidis & Spirakis 2006, IPL).
    Scale shape: one scan-side expression + one per-stratum top-n
    window (the same TakeOrdered shape as every top-k here) — no
    all-corpus sort, no driver RNG state, mergeable across shards by
    re-ranking the per-shard winners (the KMV-style union).

    Cross-engine determinism: u is dyadic ((md5_48 + 0.5) / 2^48 —
    exact in both engines), and the pow key is ROUNDED to 12
    significant digits with the floor-half-up helper and tiebroken by
    doc_id before ranking, so a last-ulp libm difference between
    JVM ``Math.pow`` and C++ ``std::pow`` cannot flip the selection
    boundary (the r7 rounded-total-order lesson)."""
    docs = load(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 48))
    key = rnd(F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double")), 12)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("k").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("source", "doc_id", "n_chars", key.alias("k"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("source", "rk", "doc_id", "n_chars")
        .orderBy("source", "rk")
    )


def ml_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe (out-of-fold) target encoding — the categorical-
    feature workhorse that naive mean-encoding gets WRONG by letting a
    row see its own label: rows are dealt into 5 md5 folds (the same
    deterministic hash as ml_kfold_stats), and fold f's encoding for
    category c is the target mean computed over the OTHER folds,
    ``(S_c - S_cf) / (n_c - n_cf)``. Everything derives from one
    per-(category, fold) sum/count aggregate — category totals are a
    window over that 25-row frame (a groupBy+join-back would re-scan
    the fact: Spark gets no static exchange reuse across the two
    branches), so the fact table is scanned once and shuffled once
    regardless of size; encodings for a trillion rows are a 25-row
    broadcast joined back at apply time.
    ``leakage_gap`` (in-fold mean minus out-of-fold encoding) is
    reported per cell: systematically large gaps are the overfit
    signal this construction exists to kill."""
    orders = load(spark, sf_dir, "orders")
    fold = _md5_bucket(F.col("o_orderkey").cast("string"), 5)
    cf = (
        orders.select(
            F.col("o_orderpriority").alias("cat"),
            fold.alias("fold"),
            F.col("o_totalprice").alias("y"),
        )
        .groupBy("cat", "fold")
        .agg(F.count(F.lit(1)).alias("n_f"), F.sum("y").alias("s_f"))
    )
    # category totals as a window over the 25-row aggregate, NOT a
    # groupBy+join back (that shape re-scans the fact: no static
    # exchange reuse across the two aggregation branches)
    from pyspark.sql import Window

    wcat = Window.partitionBy("cat")
    n_c = F.sum("n_f").over(wcat)
    s_c = F.sum("s_f").over(wcat)
    enc = (s_c - F.col("s_f")) / (n_c - F.col("n_f"))
    return (
        cf.select(
            "cat",
            "fold",
            "n_f",
            rnd(enc, 2).alias("enc_oof"),
            rnd(F.col("s_f") / F.col("n_f") - enc, 2).alias("leakage_gap"),
        )
        .orderBy("cat", "fold")
    )


QUERIES = {
    "ml_train_split": ml_train_split,
    "ml_weighted_sample": ml_weighted_sample,
    "ml_target_encode": ml_target_encode,
    "ml_winsorize": ml_winsorize,
    "ml_robust_scale": ml_robust_scale,
    "ml_negative_pairs": ml_negative_pairs,
    "ml_kfold_stats": ml_kfold_stats,
    "ml_feature_hashing": ml_feature_hashing,
    "ml_quantile_bins": ml_quantile_bins,
    "ml_standardize": ml_standardize,
    "ml_class_weights": ml_class_weights,
}

ORACLES = {
    "ml_target_encode": f"""
        WITH f AS (
            SELECT o_orderpriority AS cat,
                   {_md5_bucket_sql("CAST(o_orderkey AS VARCHAR)", 5)} AS fold,
                   o_totalprice AS y
            FROM orders
        ),
        cf AS (
            SELECT cat, fold, CAST(COUNT(*) AS BIGINT) AS n_f,
                   SUM(y) AS s_f
            FROM f GROUP BY cat, fold
        ),
        tot AS (
            SELECT cat, CAST(SUM(n_f) AS BIGINT) AS n_c, SUM(s_f) AS s_c
            FROM cf GROUP BY cat
        )
        SELECT cat, fold, n_f,
               FLOOR((s_c - s_f) / (n_c - n_f) * 1e2 + 0.5) / 1e2 AS enc_oof,
               FLOOR((s_f / n_f - (s_c - s_f) / (n_c - n_f)) * 1e2 + 0.5) / 1e2
                   AS leakage_gap
        FROM cf JOIN tot USING (cat)
        ORDER BY cat, fold
    """,
    "ml_weighted_sample": """
        WITH keyed AS (
            SELECT source, doc_id, n_chars,
                   FLOOR(
                     POW(
                       (CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS DOUBLE)
                        + CAST(0.5 AS DOUBLE))
                       / CAST(281474976710656 AS DOUBLE),
                       CAST(1.0 AS DOUBLE) / CAST(n_chars AS DOUBLE)
                     ) * 1e12 + CAST(0.5 AS DOUBLE)
                   ) / 1e12 AS k
            FROM documents
        ),
        ranked AS (
            SELECT source, doc_id, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY k DESC, doc_id
                   ) AS rk
            FROM keyed
        )
        SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_chars
        FROM ranked WHERE rk <= 5
        ORDER BY source, rk
    """,
    "ml_train_split": f"""
        WITH assigned AS (
            SELECT *,
                   {_md5_bucket_sql("CAST(doc_id AS VARCHAR)", 100)} AS b
            FROM documents
        )
        SELECT CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split,
               source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               FLOOR((AVG(n_chars)) * 1e4 + 0.5) / 1e4 AS avg_chars
        FROM assigned
        GROUP BY 1, 2
        ORDER BY split, source
    """,
    "ml_negative_pairs": f"""
        WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
        anchors AS (
            SELECT doc_id AS anchor_id, source AS anchor_source, n_docs,
                   ({_md5_bucket_sql("CAST(doc_id AS VARCHAR)", 997)})
                       % (n_docs - 1) + 1 AS stride
            FROM documents, n
            WHERE doc_id % 25 = 0
        ),
        pairs AS (
            SELECT anchor_id, anchor_source, s.j,
                   (anchor_id + s.j * stride) % n_docs AS neg_id
            FROM anchors CROSS JOIN generate_series(1, {NEG_K}) AS s(j)
        )
        SELECT p.anchor_id, p.anchor_source, CAST(p.j AS INT) AS j,
               p.neg_id, d.source AS neg_source
        FROM pairs p JOIN documents d ON p.neg_id = d.doc_id
        WHERE p.neg_id <> p.anchor_id
        ORDER BY p.anchor_id, p.j
    """,
    "ml_winsorize": """
        WITH cuts AS (
            SELECT quantile_cont(o_totalprice, 0.01) AS p01,
                   quantile_cont(o_totalprice, 0.99) AS p99
            FROM orders
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (o_totalprice < p01) AS BIGINT)
                   AS n_clipped_lo,
               CAST(COUNT(*) FILTER (o_totalprice > p99) AS BIGINT)
                   AS n_clipped_hi,
               FLOOR(ANY_VALUE(p01) * 1e4 + 0.5) / 1e4 AS p01,
               FLOOR(ANY_VALUE(p99) * 1e4 + 0.5) / 1e4 AS p99,
               FLOOR(AVG(o_totalprice) * 1e4 + 0.5) / 1e4 AS mean_raw,
               FLOOR(AVG(LEAST(GREATEST(o_totalprice, p01), p99)) * 1e4
                     + 0.5) / 1e4 AS mean_winsorized
        FROM orders, cuts
    """,
    "ml_robust_scale": """
        WITH fit AS (
            SELECT c_mktsegment,
                   quantile_cont(c_acctbal, 0.5) AS med,
                   quantile_cont(c_acctbal, 0.75)
                       - quantile_cont(c_acctbal, 0.25) AS iqr
            FROM customer GROUP BY c_mktsegment
        )
        SELECT c.c_mktsegment,
               FLOOR(ANY_VALUE(f.med) * 1e4 + 0.5) / 1e4 AS median,
               FLOOR(ANY_VALUE(f.iqr) * 1e4 + 0.5) / 1e4 AS iqr,
               FLOOR(MIN((c.c_acctbal - f.med) / f.iqr) * 1e6 + 0.5) / 1e6
                   AS scaled_min,
               FLOOR(MAX((c.c_acctbal - f.med) / f.iqr) * 1e6 + 0.5) / 1e6
                   AS scaled_max
        FROM customer c JOIN fit f USING (c_mktsegment)
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    "ml_kfold_stats": f"""
        SELECT {_md5_bucket_sql("CAST(c_custkey AS VARCHAR)", 5)} AS fold,
               COUNT(*) AS n_rows,
               FLOOR((AVG(c_acctbal)) * 1e4 + 0.5) / 1e4 AS avg_bal,
               COUNT(DISTINCT c_mktsegment) AS n_segments
        FROM customer
        GROUP BY 1
        ORDER BY fold
    """,
    "ml_feature_hashing": f"""
        WITH tok AS (
            SELECT doc_id, t.term
            FROM documents,
                 UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
            WHERE t.term <> ''
        )
        SELECT {_md5_bucket_sql("term", 256)} AS bucket,
               COUNT(*) AS tf,
               COUNT(DISTINCT doc_id) AS df
        FROM tok
        GROUP BY 1
        ORDER BY tf DESC, bucket ASC
        LIMIT 20
    """,
    "ml_quantile_bins": """
        WITH edges AS (
            SELECT MIN(o_totalprice) AS lo_all, MAX(o_totalprice) AS hi_all
            FROM orders
        ),
        binned AS (
            SELECT o_totalprice,
                   CAST(LEAST(FLOOR((o_totalprice - lo_all)
                                    / (hi_all - lo_all) * 10.0),
                              9) AS BIGINT) AS bin
            FROM orders, edges
        )
        SELECT bin,
               COUNT(*) AS n_rows,
               FLOOR((MIN(o_totalprice)) * 1e2 + 0.5) / 1e2 AS lo,
               FLOOR((MAX(o_totalprice)) * 1e2 + 0.5) / 1e2 AS hi,
               FLOOR((AVG(o_totalprice)) * 1e4 + 0.5) / 1e4 AS mean_price
        FROM binned
        GROUP BY bin
        ORDER BY bin
    """,
    "ml_standardize": """
        WITH stats AS (
            SELECT AVG(c_acctbal) AS mu,
                   stddev_samp(c_acctbal) AS sigma
            FROM customer
        ),
        scored AS (
            SELECT c_custkey,
                   FLOOR(c_acctbal * 1e2 + 0.5) / 1e2 AS acctbal,
                   FLOOR(((c_acctbal - mu) / sigma) * 1e6 + 0.5) / 1e6
                       AS zscore
            FROM customer, stats
        )
        SELECT * FROM scored
        ORDER BY ABS(zscore) DESC, c_custkey ASC
        LIMIT 15
    """,
    "ml_class_weights": """
        WITH per AS (
            SELECT c_mktsegment, COUNT(*) AS n_class
            FROM customer GROUP BY c_mktsegment
        ),
        tot AS (
            SELECT SUM(n_class) AS n_total, COUNT(*) AS n_classes FROM per
        )
        SELECT c_mktsegment, n_class,
               FLOOR((CAST(n_total AS DOUBLE) / (n_classes * n_class)) * 1e6
                     + 0.5) / 1e6 AS weight
        FROM per, tot
        ORDER BY c_mktsegment
    """,
}
