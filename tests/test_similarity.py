"""Similarity search: crafted geometry + LSH recall vs brute force."""

from __future__ import annotations

import pytest

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.operators import similarity as S


@pytest.fixture(scope="module")
def crafted(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_ordering(crafted):
    queries = crafted.filter("vec_id = 0").withColumnRenamed("vec_id", "query_id")
    corpus = crafted.filter("vec_id != 0")
    out = S.cosine_topk(queries, corpus, k=3).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [1, 2, 3]
    assert out[0]["cos_sim"] > 0.99
    assert abs(out[1]["cos_sim"]) < 1e-6
    assert out[2]["cos_sim"] == -1.0


def test_lsh_recall_on_clustered_data(spark):
    # Sign-LSH pays off on clustered corpora (the fixture embeddings
    # are isotropic random — within-label cos ~= 0 — where no LSH can
    # recall well). Build 10 tight clusters; top-1 must be recalled.
    import math
    import random

    rng = random.Random(7)
    centroids = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(10)]
    rows = []
    vid = 0
    for label, c in enumerate(centroids):
        for _ in range(20):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in c]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id % 20 = 0").withColumnRenamed("vec_id", "query_id")
    corpus = df.filter("vec_id % 20 != 0")
    brute_top1 = {
        r["query_id"]: r["vec_id"] for r in S.cosine_topk(queries, corpus, k=1).collect()
    }
    lsh_top1 = {
        r["query_id"]: r["vec_id"]
        for r in S.lsh_topk(queries, corpus, dim=16, k=1).collect()
    }
    hits = sum(1 for q, v in lsh_top1.items() if brute_top1.get(q) == v)
    assert hits >= math.ceil(0.8 * len(brute_top1))


def test_lsh_scores_match_brute_for_returned_pairs(spark, sf_dir):
    # On any corpus: whatever pairs LSH returns, the cosine must equal
    # the brute-force cosine (rerank is exact).
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 5").withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter("vec_id >= 5")
    brute = {
        (r["query_id"], r["vec_id"]): r["cos_sim"]
        for r in S.cosine_topk(queries, corpus, k=1000).collect()
    }
    for r in S.lsh_topk(queries, corpus, dim=64, k=5).collect():
        key = (r["query_id"], r["vec_id"])
        assert key in brute and brute[key] == r["cos_sim"]


def test_dot_and_norm(crafted):
    import pyspark.sql.functions as F

    row = (
        crafted.filter("vec_id = 1")
        .select(S.l2_norm(F.col("embedding")).alias("n"))
        .collect()[0]
    )
    assert abs(row["n"] - (0.9**2 + 0.1**2) ** 0.5) < 1e-6


def test_ivf_recall_on_clustered_data(spark):
    # IVF with one Lloyd step should recover tight clusters as cells;
    # probing 4/8 cells must recall the top-1 neighbor for most queries.
    import math
    import random

    rng = random.Random(11)
    centroids = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(8)]
    rows = []
    vid = 0
    for c in centroids:
        for _ in range(25):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in c]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id % 25 = 0").withColumnRenamed("vec_id", "query_id")
    corpus = df.filter("vec_id % 25 != 0")
    brute_top1 = {
        r["query_id"]: r["vec_id"] for r in S.cosine_topk(queries, corpus, k=1).collect()
    }
    ivf_top1 = {
        r["query_id"]: r["vec_id"]
        for r in S.ivf_topk(queries, corpus, k=1, nlist=8, nprobe=4).collect()
    }
    hits = sum(1 for q, v in ivf_top1.items() if brute_top1.get(q) == v)
    assert hits >= math.ceil(0.8 * len(brute_top1))


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    # nprobe == nlist probes every cell -> IVF degenerates to the exact
    # scan; results must match brute force row-for-row.
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 3").withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter("vec_id >= 3")
    brute = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in S.cosine_topk(queries, corpus, k=3).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in S.ivf_topk(queries, corpus, k=3, nlist=4, nprobe=4).collect()
    }
    assert ivf == brute


def test_lsh_topk_probe_bits_2_expands_candidates(spark):
    # ADVICE r1: probe_bits >= 2 used to silently behave like 1; the
    # offset set must contain all masks of Hamming weight <= probe_bits
    import pyspark.sql.functions as F

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    k = 4
    r1 = S.lsh_topk(queries, corpus, dim=4, k=k, n_planes=6, probe_bits=1).count()
    r2 = S.lsh_topk(queries, corpus, dim=4, k=k, n_planes=6, probe_bits=2).count()
    rall = S.lsh_topk(queries, corpus, dim=4, k=k, n_planes=6, probe_bits=6).count()
    assert r1 <= r2 <= rall
    assert rall == k  # probing every bucket == brute force recall


def test_quantized_topk_agrees_with_exact(spark, sf_dir):
    # int8 quantization at 64 dims should preserve most of the exact
    # top-5 neighborhood (dot-product ranking)
    import pyspark.sql.functions as F

    from quack_reduce_spark.inventory._util import load

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    quant = {
        (r["query_id"], r["vec_id"])
        for r in S.quantized_topk(queries, corpus, k=5).collect()
    }
    exact_dot = (
        queries.crossJoin(corpus.withColumnRenamed("embedding", "c_emb"))
        .select(
            "query_id",
            "vec_id",
            S.dot(F.col("embedding"), F.col("c_emb")).alias("d"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("d").desc(), F.col("vec_id").asc())
    exact = {
        (r["query_id"], r["vec_id"])
        for r in exact_dot.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert len(quant & exact) / len(exact) >= 0.8


def test_quantized_topk_zero_vector_safe(spark):
    # all-zero vectors must not divide by zero (scale floor 1e-12)
    import pyspark.sql.functions as F

    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.5, 0.5])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    out = S.quantized_topk(q, emb.filter(F.col("vec_id") > 0), k=2).collect()
    assert len(out) == 2 and all(r["approx_dot"] == 0.0 for r in out)


def test_ivf_prebuilt_matches_inmemory_and_prunes(spark, sf_dir, tmp_path):
    """ivf_build + ivf_topk_prebuilt == ivf_topk, and the probe scan is
    partition-pruned to the probed cells (the 100 TB deployment:
    ANN probing as partition pruning — SCALE.md similarity section)."""
    import pyspark.sql.functions as F

    from quack_reduce_spark import plans

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select("vec_id", "embedding")

    path = str(tmp_path / "ivf")
    S.ivf_build(corpus, path, nlist=16)
    prebuilt = S.ivf_topk_prebuilt(spark, queries, path, k=5, nprobe=4)
    inmem = S.ivf_topk(queries, corpus, k=5, nlist=16, nprobe=4)

    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, prebuilt.collect()), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, inmem.collect()), key=lambda t: (t[0], t[3])
    )

    # plan evidence (same standard as the hive-layout pruning test):
    # the cell predicate must land in PartitionFilters — a partition-
    # pruned scan, not a data filter over a full read
    cells_df = spark.read.parquet(f"{path}/corpus").filter(F.col("cell").isin([3, 4]))
    plan = plans.formatted_plan(cells_df)
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:120]
    # and the layout really is one directory per cell
    import os

    cells_on_disk = [d for d in os.listdir(f"{path}/corpus") if d.startswith("cell=")]
    assert len(cells_on_disk) == 16


def test_vectorized_topk_matches_jvm_exact(spark, sf_dir):
    """The numpy-kernel variant must return the same neighbor ids and
    ranks as the interpreted-JVM exact operator (scores can differ in
    the last ulp; rnd(6) absorbs it on this data)."""
    import pyspark.sql.functions as F

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    a = S.cosine_topk(queries, corpus, k=5).collect()
    b = S.cosine_topk_vectorized(spark, queries, corpus, k=5).collect()
    ka = {(r["query_id"], r["rank"]): r["vec_id"] for r in a}
    kb = {(r["query_id"], r["rank"]): r["vec_id"] for r in b}
    assert ka == kb


def test_recall_floor_gate_runs_clean():
    # the recall CI gate (tools/recall_report.py --check) must pass at
    # the small fixture: floors only engage where the exact side has
    # enough support, so this exercises the gate code path end-to-end
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/recall_report.py", "/root/testdata/sf0.001", "--check"],
        capture_output=True, text=True, cwd="/root/repo", timeout=500,
    )
    assert "RECALL CHECK FAILURES: 0" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]
    assert r.returncode == 0


def test_pq_topk_recall_on_clustered_data(spark):
    # PQ-ADC on clustered vectors: top-1 must recover the true nearest
    # cluster members with high recall (the regime PQ compresses for)
    import random

    from quack_reduce_spark.operators import similarity as S

    rng = random.Random(9)
    cents = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(8)]
    rows, vid = [], 0
    for c in cents:
        for _ in range(20):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in c]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id % 20 = 0").withColumnRenamed("vec_id", "query_id")
    corpus = df.filter("vec_id % 20 != 0")

    brute1 = {
        (r["query_id"], r["vec_id"])
        for r in S.cosine_topk(queries, corpus, k=1).collect()
    }
    pq1 = {
        (r["query_id"], r["vec_id"])
        for r in S.pq_topk(queries, corpus, k=1, m=4, ksub=16, rerank=24).collect()
    }
    assert len(pq1 & brute1) >= int(0.8 * len(brute1))


def test_pq_deterministic_and_bounded(spark):
    from quack_reduce_spark.operators import similarity as S

    import random

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 3").withColumnRenamed("vec_id", "query_id")
    c = df.filter("vec_id >= 3")
    a = sorted(map(tuple, S.pq_topk(q, c, k=5, m=4, ksub=8).collect()))
    b = sorted(map(tuple, S.pq_topk(q, c, k=5, m=4, ksub=8).collect()))
    assert a == b
    # exactly k rows per query, ranks 1..k
    per_q = {}
    for qid, _vid, _s, rank in a:
        per_q.setdefault(qid, []).append(rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


# ---------------------------------------------------------------- PCA

def test_pca_scores_match_numpy_power_iteration(spark):
    import numpy as np

    from quack_reduce_spark.operators.pca import pca_scores

    rng = np.random.RandomState(3)
    d, n = 16, 200
    # anisotropic cloud: one dominant direction
    base = rng.randn(n, d) * 0.1
    direction = rng.randn(d)
    base += np.outer(rng.randn(n) * 2.0, direction / np.linalg.norm(direction))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        r.vec_id: r.score
        for r in pca_scores(df, "vec_id", "embedding", dim=d, rounds=3).collect()
    }

    X = np.array([[np.float32(x) for x in base[i]] for i in range(n)], dtype=np.float64)
    Xc = X - X.mean(axis=0)
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(3):
        w = Xc.T @ (Xc @ v)
        v = w / np.linalg.norm(w)
    want = Xc @ v
    assert set(got) == set(range(n))
    for i in range(n):
        assert abs(got[i] - want[i]) < 1e-9 * max(1.0, abs(want[i]))


def test_pca_rejects_zero_variance_and_bad_rounds(spark):
    import pytest

    from quack_reduce_spark.operators.pca import pca_scores

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="zero-variance"):
        pca_scores(df, "vec_id", "embedding", dim=2, rounds=1).collect()
    with pytest.raises(ValueError, match="rounds"):
        pca_scores(df, "vec_id", "embedding", dim=2, rounds=0)


def test_pca_variance_profile_bounds(spark):
    import numpy as np

    from quack_reduce_spark.operators.pca import pca_variance_profile

    rng = np.random.RandomState(5)
    d, n = 8, 120
    base = rng.randn(n, d) * 0.05
    direction = np.ones(d) / np.sqrt(d)
    base += np.outer(rng.randn(n) * 3.0, direction)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = pca_variance_profile(df, "vec_id", "embedding", dim=d, rounds=3).collect()[0]
    assert r.n_vectors == n
    # top component can't exceed total variance; planted anisotropy
    # means it captures almost everything
    assert 0 < r.var_top <= r.var_total
    assert r.var_top / r.var_total > 0.95
