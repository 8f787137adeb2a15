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
    q = F.broadcast(
        queries.select(F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qvec"))
    )
    c = corpus.select(F.col(corpus_id).alias("__cid"), F.col(vec_col).alias("__cvec"))
    scored = q.crossJoin(c).select(
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


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (public
    splitmix64-style integer mixing → uniform in [-1, 1])."""
    planes = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z = z ^ (z >> 31)
            row.append((z / float(1 << 64)) * 2.0 - 1.0)
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
    The bucket join shuffles on the bucket key; candidates per query =
    (1 + n_planes) / 2^n_planes of the corpus at probe_bits=1.
    """
    probe_offsets = [0] + ([1 << p for p in range(n_planes)] if probe_bits >= 1 else [])
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
