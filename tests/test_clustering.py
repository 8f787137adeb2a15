"""Spherical k-means (operators/clustering.py): planted-structure
recovery + determinism + convergence contract."""

from __future__ import annotations

import random

import pytest


@pytest.fixture(scope="module")
def clustered(spark):
    # 6 tight gaussian clusters of 15 vectors in 16-d
    rng = random.Random(5)
    cents = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(6)]
    rows, vid = [], 0
    for ci, c in enumerate(cents):
        for _ in range(15):
            rows.append((vid, ci, [x + rng.gauss(0, 0.05) for x in c]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, true_cluster int, embedding array<double>"
    )


def test_kmeans_recovers_planted_clusters(spark, clustered):
    from quack_reduce_spark.operators.clustering import kmeans_assign

    out = kmeans_assign(clustered, k=6).collect()
    assert len(out) == 90
    # purity: every kmeans cell maps to exactly one planted cluster
    truth = {r["vec_id"]: r["true_cluster"] for r in clustered.collect()}
    by_cell: dict[int, set[int]] = {}
    for r in out:
        by_cell.setdefault(r["cell"], set()).add(truth[r["vec_id"]])
    assert all(len(s) == 1 for s in by_cell.values())
    assert len(by_cell) == 6


def test_kmeans_deterministic(spark, clustered):
    from quack_reduce_spark.operators.clustering import kmeans_assign

    a = sorted(map(tuple, kmeans_assign(clustered, k=6).collect()))
    b = sorted(map(tuple, kmeans_assign(clustered, k=6).collect()))
    assert a == b


def test_kmeans_raises_when_iteration_budget_too_small(spark, clustered):
    from quack_reduce_spark.operators.clustering import kmeans_assign

    with pytest.raises(RuntimeError, match="did not converge"):
        kmeans_assign(clustered, k=6, max_iter=1, tol=1e-12)


def test_kmeans_profile_shape(spark, clustered):
    from quack_reduce_spark.operators.clustering import kmeans_profile

    rows = kmeans_profile(clustered, k=6).collect()
    assert len(rows) == 6
    assert sum(r["n_vectors"] for r in rows) == 90
    # tight planted clusters -> very high cohesion
    assert all(r["mean_cohesion"] > 0.95 for r in rows)
    assert all(r["min_cohesion"] <= r["mean_cohesion"] for r in rows)


def test_kmeans_raises_on_cluster_collapse(spark):
    # two identical seed vectors: every point ties to both centroids and
    # the deterministic tiebreak sends all members to the lower cell, so
    # the other centroid gets zero members — must raise, not silently
    # converge with fewer than k clusters
    from quack_reduce_spark.operators.clustering import kmeans_assign

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(6)]
    rows.append((6, [0.0, 1.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(RuntimeError, match="cluster collapse"):
        kmeans_assign(df, k=2)
