"""Distributed spherical k-means over an embedding column.

The full iterative version of the single Lloyd step the IVF index
build uses (operators/similarity.py:_centroids): deterministic seeding
(k lowest-id vectors), then assign → re-mean → re-normalize rounds
until centroid movement falls under ``tol`` or ``max_iter`` is hit.
Spherical variant (unit vectors, cosine assignment) — the standard
choice for embedding spaces, and it keeps every step a JVM expression:
dot products via ``F.aggregate``/``zip_with``, means via posexplode.

Scale (100 TB): per round, the corpus is scanned once — centroids are
broadcast (k × dim doubles), assignment is a map-side max_by hash
aggregate keyed by row id, and the re-mean shuffles (cell, pos, val)
component rows — k×dim groups regardless of corpus size. The driver
loop reads ONE scalar per round (total centroid movement), never row
data; lineage is cut per round with localCheckpoint, the same
discipline as operators/components.py.

The result is non-SQL-expressible (iterative fixpoint), so registry
exposure is rows-only + unit tests against planted cluster structure
(tests/test_clustering.py), mirroring how MinHash/LSH are gated.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from quack_reduce_spark.operators.similarity import _as_double, cosine


def _normalize(vec):
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(vec, lambda x: x / norm)


def kmeans_assign(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 20,
    tol: float = 1e-4,
) -> DataFrame:
    """(corpus_id, cell, cos_sim): every vector labeled with its final
    cluster and its cosine to that cluster's centroid.

    Raises if the loop hits ``max_iter`` while centroids are still
    moving more than ``tol`` (a silently unconverged clustering is
    wrong the same way an unconverged connected-components run is).
    """
    vecs = corpus.select(
        F.col(corpus_id).alias("__id"),
        _normalize(_as_double(F.col(vec_col))).alias("__vec"),
    ).localCheckpoint(eager=False)

    cents = (
        vecs.orderBy(F.col("__id").asc())
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(F.col("__id").asc())).alias("__cell"),
            F.col("__vec").alias("__cvec"),
        )
        .localCheckpoint(eager=True)
    )

    def assign(c: DataFrame) -> DataFrame:
        return (
            vecs.crossJoin(F.broadcast(c))
            .withColumn("__d", cosine(F.col("__vec"), F.col("__cvec")))
            .groupBy("__id")
            .agg(
                F.max_by(
                    F.struct(F.col("__cell"), F.col("__d"), F.col("__vec")),
                    # tiebreak to the lowest cell for determinism
                    F.struct(F.col("__d"), (-F.col("__cell")).alias("__tb")),
                ).alias("__best")
            )
            .select(
                "__id",
                F.col("__best.__cell").alias("__cell"),
                F.col("__best.__d").alias("__d"),
                F.col("__best.__vec").alias("__vec"),
            )
        )

    moved = None
    for _ in range(max_iter):
        assigned = assign(cents)
        comp = assigned.select(
            "__cell", F.posexplode("__vec").alias("__pos", "__val")
        )
        new_cents = (
            comp.groupBy("__cell", "__pos")
            .agg(F.avg("__val").alias("__m"))
            .groupBy("__cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__m"))),
                    lambda s: s["__m"],
                ).alias("__mean")
            )
            .select("__cell", _normalize(F.col("__mean")).alias("__cvec"))
            .localCheckpoint(eager=True)
        )
        n_cells = new_cents.count()
        if n_cells < k:
            # A centroid with zero members vanishes from the re-mean;
            # the movement join below would silently drop its cell and
            # convergence could be declared with < k clusters. Surface
            # the collapse instead (same contract as non-convergence:
            # a silently degenerate clustering is wrong). Callers pick
            # a smaller k or better-separated seeds.
            raise RuntimeError(
                f"k-means cluster collapse: {k - n_cells} of {k} centroids "
                f"received zero members this round (duplicate/degenerate "
                f"seeds or k too large for the data)"
            )
        moved = (
            cents.alias("o")
            .join(new_cents.alias("n"), "__cell")
            .select(
                (1 - cosine(F.col("o.__cvec"), F.col("n.__cvec"))).alias("__mv")
            )
            .agg(F.sum("__mv"))
            .collect()[0][0]
        )
        cents = new_cents
        if moved is not None and moved < tol:
            break
    if moved is None or moved >= tol:
        raise RuntimeError(
            f"kmeans did not converge within max_iter={max_iter} rounds "
            f"(total centroid movement {moved}); raise max_iter or tol — "
            f"an unconverged clustering would be silently wrong"
        )
    final = assign(cents)
    return final.select(
        F.col("__id").alias(corpus_id),
        F.col("__cell").alias("cell"),
        F.col("__d").alias("cos_sim"),
    )


def kmeans_profile(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 80,
) -> DataFrame:
    """Per-cluster profile of a converged k-means run: size, mean/min
    cosine to centroid (cohesion), and the lowest member id (a
    deterministic exemplar key). The corpus-analysis surface: cluster
    balance and cohesion are the standard diagnostics before using
    clusters for curation (per-cluster sampling, cluster-level dedup).

    ``max_iter`` defaults higher than :func:`kmeans_assign`'s because
    profiling runs on full corpora where Lloyd's tail is long (the
    sf0.1 fixture needs ~20-80 rounds to pass tol=1e-4); the
    convergence contract — raise rather than return an unconverged
    clustering — is inherited unchanged.
    """
    from quack_reduce_spark.functions.numeric import rnd

    assigned = kmeans_assign(corpus, corpus_id, vec_col, k, max_iter)
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        rnd(F.avg("cos_sim"), 6).alias("mean_cohesion"),
        rnd(F.min("cos_sim"), 6).alias("min_cohesion"),
        F.min(corpus_id).alias("exemplar_id"),
    )
