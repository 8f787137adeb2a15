"""Principal-component extraction over an embedding column via
fixed-round power iteration — the embedding-pipeline primitive behind
whitening, anisotropy removal ("all-but-the-top"), and 1-D corpus
ordering.

Algorithm: center X, then iterate v ← Xᵀ(Xv) / ‖·‖ from the
deterministic init v₀ = 1/√d. Each round touches the corpus ONCE:

- s_i = (x_i − μ)·v  — a JVM higher-order-function projection
  (zip_with + aggregate), no shuffle, no Python;
- w_j = Σ_i s_i(x_ij − μ_j) — one posexplode + map-side-combined
  aggregate onto d keys (the combiner collapses each partition to d
  rows before the shuffle, so the shuffle moves d × n_partitions
  rows regardless of corpus size);
- normalization of the d-vector happens on the driver — d doubles,
  the same bounded "scalar fit step" contract as
  operators/clustering.py's centroid reads.

A FIXED round count keeps the whole computation replayable as
unrolled SQL (the pagerank.py / bfs.py oracle trick), and with the
deterministic init the eigenvector's sign is reproducible — power
iteration's usual ±v ambiguity disappears. 3 rounds is a ratio-test
sweet spot for corpora whose top eigengap is wide (embedding tables
overwhelmingly are: anisotropy concentrates mass on one direction);
callers needing certified convergence run more rounds and check the
Rayleigh-quotient delta between the last two.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from quack_reduce_spark.operators.reuse import reuse_persist


def _lit_array(vals: list[float]):
    return F.array(*[F.lit(float(x)) for x in vals])


def pca_scores(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    rounds: int = 3,
) -> DataFrame:
    """Per-row projection onto the (power-iterated) top principal
    component of ``vec_col``. Returns (id_col, score); scores carry
    the component's deterministic sign."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    centered = _center(df, id_col, vec_col, dim)
    v = _power_fit(centered, dim, rounds)
    return centered.select(
        id_col,
        F.aggregate(
            F.zip_with(F.col("cv"), _lit_array(v), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )


def _center(df: DataFrame, id_col: str, vec_col: str, dim: int) -> DataFrame:
    """(id, cv:array<double>) — vectors minus the corpus mean. The mean
    is one posexplode aggregate; the d collected doubles are the only
    driver-side data.

    The centered frame is MATERIALIZED (lazy persist via
    reuse_persist, so the first power round's action both computes and
    caches it): every power round's w-aggregate plus the caller's
    final scoring pass is a separate driver action, and exchange reuse
    cannot help across actions — without the materialization each of
    those 4-5 jobs re-ran the scan + cast + zip_with centering from
    the source (r16 A/B: ~15% whole-query win at sf0.1). One
    array<double> row per vector — the same bytes the source holds —
    so at cluster scale this is "persist the centered matrix before
    iterating", the standard power-iteration shape; r17 swapped the
    former localCheckpoint for persist so an executor loss mid-
    iteration recomputes partitions instead of killing the job
    (guide §5)."""
    e = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).select(id_col, "pos", F.col("val").cast("double").alias("val"))
    mu_rows = e.groupBy("pos").agg(F.avg("val").alias("m")).collect()
    mu = [0.0] * dim
    for r in mu_rows:
        mu[r["pos"]] = float(r["m"])
    centered = df.select(
        F.col(id_col),
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            _lit_array(mu),
            lambda x, m: x - m,
        ).alias("cv"),
    )
    return reuse_persist(centered, "pca.centered")


def _power_fit(centered: DataFrame, dim: int, rounds: int) -> list[float]:
    """The iteration itself: returns the unit top-eigenvector estimate
    after ``rounds`` passes over ``centered`` (a (_, cv:array<double>)
    frame). Each round's driver read is the d-double w vector."""
    v = [1.0 / math.sqrt(dim)] * dim
    for _ in range(rounds):
        s = centered.withColumn(
            "s",
            F.aggregate(
                F.zip_with(F.col("cv"), _lit_array(v), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        w_rows = (
            s.select("s", F.posexplode(F.col("cv")).alias("pos", "c"))
            .groupBy("pos")
            .agg(F.sum(F.col("s") * F.col("c")).alias("w"))
            .collect()
        )
        w = [0.0] * dim
        for r in w_rows:
            w[r["pos"]] = float(r["w"])
        norm = math.sqrt(sum(x * x for x in w))
        if norm == 0.0:
            raise ValueError("power iteration collapsed: zero-variance input")
        v = [x / norm for x in w]
    return v


def pca_variance_profile(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    rounds: int = 3,
) -> DataFrame:
    """One-row anisotropy report: total centered variance, variance
    captured by the power-iterated top component, and their ratio —
    the number that says whether un-whitened cosine similarity over
    this embedding table is dominated by one direction. Same fit as
    :func:`pca_scores`; one extra corpus pass for the two variance
    aggregates."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    centered = _center(df, id_col, vec_col, dim)
    v = _power_fit(centered, dim, rounds)
    dot_v = F.aggregate(
        F.zip_with(F.col("cv"), _lit_array(v), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq = F.aggregate(
        F.col("cv"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return centered.select(
        dot_v.alias("s"), sq.alias("sq")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.avg("sq").alias("var_total"),
        F.avg(F.col("s") * F.col("s")).alias("var_top"),
    )
