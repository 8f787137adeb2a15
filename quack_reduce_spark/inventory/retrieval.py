"""Lexical retrieval over the documents table: BM25 search and TF-IDF
keyword extraction — the index/search half of a training-data platform
(retrieval for targeted curation, dedup-against-reference-corpora,
and corpus inspection). The reference has no text surface (SURVEY §2
Tier C); these extend the north-star family with the classic
posting-list shapes.

Scale shapes:

- BM25: one pivoted aggregation over the token stream (doc length +
  fixed-width per-term count_ifs), constants from the tiny per-doc
  stats table — the same "fit scalars, then score distributed" split
  as text_lm_score. The classic posting-list formulation is noted in
  the docstring as the unbounded-query-batch alternative.
- TF-IDF terms: one (doc, term) aggregate + one term-level df
  aggregate joined back — two keyed shuffles, no self-joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from quack_reduce_spark.inventory._util import load, rnd

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ["table", "join", "filter", "spark"]  # deterministic query
BM25_TOP_K = 10
TFIDF_TOP_N = 5


def _tok(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
    )


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson, k1=1.2, b=0.75, Lucene's ln(1 + (N-df+0.5)/
    (df+0.5)) idf) top-10 docs for a fixed 4-term query.

    Plan: ONE aggregation over the token stream carries doc length AND
    the per-term frequencies as pivoted count_if columns (the query is
    a small literal, so the pivot width is fixed); the |docs|-row stats
    table is checkpointed so the model-constant aggregate (N, avgdl,
    per-term df — the API-edge scalar collect) and the scoring query
    both read it without re-tokenizing. Measured 1.5× faster at sf0.1
    than the classic posting-list formulation (tf/df/dl as separate
    aggregates + joins), which shuffles the token stream three times.
    For UNBOUNDED query batches (pivot width won't fix) the
    posting-list shape is the right one — this operator is the
    single-query search path.
    """
    import math

    docs = load(spark, sf_dir, "documents")
    tok = _tok(docs)
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count_if(F.col("w") == t).alias(f"tf_{i}")
            for i, t in enumerate(BM25_QUERY)
        ],
    ).localCheckpoint(eager=True)
    consts = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count_if(F.col(f"tf_{i}") > 0).alias(f"df_{i}")
            for i in range(len(BM25_QUERY))
        ],
    ).collect()[0]
    n_docs, avgdl = consts["n_docs"], consts["avgdl"]

    def idf(i: int) -> float:
        d = consts[f"df_{i}"]
        return math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))

    def term_score(i: int):
        tf = F.col(f"tf_{i}")
        return F.when(
            tf > 0,
            F.lit(idf(i))
            * tf
            * (BM25_K1 + 1)
            / (
                tf
                + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.lit(float(avgdl)))
            ),
        ).otherwise(F.lit(0.0))

    n_idx = range(len(BM25_QUERY))
    scored = per_doc.filter(
        sum((F.col(f"tf_{i}") for i in n_idx), F.lit(0)) > 0
    ).select(
        "doc_id",
        rnd(sum((term_score(i) for i in n_idx), F.lit(0.0)), 6).alias("score"),
        sum(
            (F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0) for i in n_idx),
            F.lit(0),
        ).cast("long").alias("n_terms_matched"),
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP_K)
        .select("doc_id", "score", "n_terms_matched")
    )


def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per source (corpus keyword extraction):
    tf = term count within the source, idf = ln(n_sources /
    df_sources). Deterministic tiebreak (score desc, term asc) makes
    the per-source QUALIFY-style cut hash-stable."""
    docs = load(spark, sf_dir, "documents")
    tok = _tok(docs)
    tf = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("tf"))
    n_sources = docs.select("source").distinct().count()
    sdf = tf.groupBy("w").agg(F.count(F.lit(1)).alias("sdf"))
    scored = tf.join(F.broadcast(sdf), "w").select(
        "source",
        "w",
        rnd(
            F.col("tf") * F.log(F.lit(float(n_sources)) / F.col("sdf")), 6
        ).alias("tfidf"),
    )
    win = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("w").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= TFIDF_TOP_N)
        .select("source", F.col("w").alias("term"), "tfidf", "rk")
    )


QUERIES = {
    "text_bm25_topk": text_bm25_topk,
    "text_tfidf_terms": text_tfidf_terms,
}

_QLIST = ", ".join(f"'{t}'" for t in BM25_QUERY)

ORACLES = {
    "text_bm25_topk": f"""
        WITH tok AS (
            SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        consts AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
        tf AS (
            SELECT doc_id, w, COUNT(*) AS tf FROM tok
            WHERE w IN ({_QLIST}) GROUP BY doc_id, w
        ),
        idf AS (
            SELECT w,
                   LN(1.0 + ((SELECT n_docs FROM consts) - COUNT(*) + 0.5)
                            / (COUNT(*) + 0.5)) AS idf
            FROM tf GROUP BY w
        ),
        scored AS (
            SELECT t.doc_id,
                   FLOOR(SUM(i.idf * t.tf * ({BM25_K1} + 1)
                         / (t.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * d.dl
                            / (SELECT avgdl FROM consts)))) * 1e6 + 0.5) / 1e6
                       AS score,
                   COUNT(*) AS n_terms_matched
            FROM tf t JOIN idf i USING (w) JOIN dl d USING (doc_id)
            GROUP BY t.doc_id
        )
        SELECT doc_id, score, n_terms_matched
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT {BM25_TOP_K}
    """,
    "text_tfidf_terms": f"""
        WITH tok AS (
            SELECT doc_id, source,
                   UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
        ),
        tf AS (SELECT source, w, COUNT(*) AS tf FROM tok GROUP BY source, w),
        sdf AS (SELECT w, COUNT(*) AS sdf FROM tf GROUP BY w),
        scored AS (
            SELECT t.source, t.w,
                   FLOOR(t.tf * LN((SELECT COUNT(DISTINCT source) FROM documents)
                                   / s.sdf::DOUBLE) * 1e6 + 0.5) / 1e6 AS tfidf,
                   ROW_NUMBER() OVER (PARTITION BY t.source
                                      ORDER BY FLOOR(t.tf * LN((SELECT COUNT(DISTINCT source) FROM documents) / s.sdf::DOUBLE) * 1e6 + 0.5) / 1e6 DESC,
                                               t.w ASC) AS rk
            FROM tf t JOIN sdf s USING (w)
        )
        SELECT source, w AS term, tfidf, rk
        FROM scored WHERE rk <= {TFIDF_TOP_N}
    """,
}
