"""Semantic invariants for the ML data-prep inventory (the oracle
harness checks value equality; these check the *contracts*)."""

from __future__ import annotations

import pyspark.sql.functions as F

from quack_reduce_spark.inventory import mlprep
from quack_reduce_spark.inventory._util import load


def test_train_split_partitions_the_corpus(spark, sf_dir):
    out = mlprep.ml_train_split(spark, sf_dir).collect()
    total = sum(r.n_docs for r in out)
    assert total == load(spark, sf_dir, "documents").count()
    splits = {r.split for r in out}
    assert splits == {"train", "val", "test"}
    by_split = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    # 80/10/10 by hash: tolerate sampling noise but not a broken mod
    assert by_split["train"] > by_split["val"]
    assert by_split["train"] > by_split["test"]


def test_train_split_is_deterministic(spark, sf_dir):
    a = {tuple(r) for r in mlprep.ml_train_split(spark, sf_dir).collect()}
    b = {tuple(r) for r in mlprep.ml_train_split(spark, sf_dir).collect()}
    assert a == b


def test_kfold_covers_all_rows_with_5_folds(spark, sf_dir):
    out = mlprep.ml_kfold_stats(spark, sf_dir).collect()
    assert [r.fold for r in out] == [0, 1, 2, 3, 4]
    assert sum(r.n_rows for r in out) == load(spark, sf_dir, "customer").count()


def test_feature_hashing_buckets_in_range(spark, sf_dir):
    out = mlprep.ml_feature_hashing(spark, sf_dir).collect()
    assert len(out) == 20
    assert all(0 <= r.bucket < 256 for r in out)
    assert all(r.tf >= r.df >= 1 for r in out)
    tfs = [r.tf for r in out]
    assert tfs == sorted(tfs, reverse=True)


def test_quantile_bins_cover_range_without_sort(spark, sf_dir):
    df = mlprep.ml_quantile_bins(spark, sf_dir)
    out = df.collect()
    assert sum(r.n_rows for r in out) == load(spark, sf_dir, "orders").count()
    # bin edges are monotone and non-overlapping
    for prev, cur in zip(out, out[1:]):
        assert prev.hi <= cur.lo
    # the scale contract: no Window/Sort before the aggregate
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_standardize_extremes_and_class_weights(spark, sf_dir):
    z = mlprep.ml_standardize(spark, sf_dir).collect()
    assert len(z) == 15
    mags = [abs(r.zscore) for r in z]
    assert mags == sorted(mags, reverse=True)

    w = mlprep.ml_class_weights(spark, sf_dir).collect()
    # inverse-frequency: the rarest class gets the largest weight
    by_n = sorted(w, key=lambda r: r.n_class)
    weights = [r.weight for r in by_n]
    assert weights == sorted(weights, reverse=True)
    # balanced-weights identity: sum(n_class * weight) == n_total
    total = sum(r.n_class for r in w)
    assert abs(sum(r.n_class * r.weight for r in w) - total) < 1e-3 * total


def test_winsorize_clip_fractions(spark, sf_dir):
    r = mlprep.ml_winsorize(spark, sf_dir).collect()[0]
    # ~1% clipped each side (exact percentile => at most ceil(n*0.01))
    assert 0 < r.n_clipped_lo <= r.n_rows * 0.012 + 1
    assert 0 < r.n_clipped_hi <= r.n_rows * 0.012 + 1
    assert r.p01 < r.p99
    # clipping pulls the mean toward the center but not past the cuts
    assert r.p01 <= r.mean_winsorized <= r.p99


def test_robust_scale_centers_on_median(spark, sf_dir):
    out = mlprep.ml_robust_scale(spark, sf_dir).collect()
    assert len(out) == 5
    for r in out:
        assert r.iqr > 0
        # median maps to 0 => extremes straddle it
        assert r.scaled_min < 0 < r.scaled_max


def test_negative_pairs_contract(spark, sf_dir):
    out = mlprep.ml_negative_pairs(spark, sf_dir).collect()
    # every anchor keeps >= K-1 negatives (self-collisions filtered)
    from collections import Counter

    per_anchor = Counter(r.anchor_id for r in out)
    assert all(mlprep.NEG_K - 1 <= c <= mlprep.NEG_K for c in per_anchor.values())
    assert all(r.neg_id != r.anchor_id for r in out)
    # deterministic: two runs agree exactly
    again = mlprep.ml_negative_pairs(spark, sf_dir).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]
    # negatives are spread out, not clustered on a few docs
    neg_ids = {r.neg_id for r in out}
    assert len(neg_ids) > len(per_anchor)


def test_weighted_sample_contract(spark, sf_dir):
    """A-ES sample: exactly 5 distinct docs per source (without
    replacement), deterministic across runs, and length-BIASED —
    weight = n_chars must pull the sampled mean length above the
    population mean (the whole point of weighting)."""
    out = mlprep.ml_weighted_sample(spark, sf_dir)
    rows = out.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r.doc_id)
    docs = load(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(per_src) == n_sources
    for src, ids in per_src.items():
        assert len(ids) == 5
        assert len(set(ids)) == 5, f"replacement in {src}"
    again = {tuple(r) for r in mlprep.ml_weighted_sample(spark, sf_dir).collect()}
    assert again == {tuple(r) for r in rows}
    pop_mean = docs.agg(F.avg("n_chars")).first()[0]
    samp_mean = sum(r.n_chars for r in rows) / len(rows)
    assert samp_mean > pop_mean, (samp_mean, pop_mean)


def test_weighted_sample_merges_across_shards(spark, sf_dir):
    """The scale story the docstring claims: shard the corpus, take
    each shard's per-source top-5 by the SAME deterministic key, union
    the winners and re-rank — the result must equal the global sample
    (the key is a pure row property, so per-shard pruning is safe:
    the global top-5 of a stratum is a subset of the union of shard
    top-5s)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 48))
    from quack_reduce_spark.inventory._util import rnd

    keyed = docs.select(
        "source",
        "doc_id",
        rnd(F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double")), 12).alias("k"),
    )
    w = Window.partitionBy("source").orderBy(F.col("k").desc(), F.col("doc_id"))
    glob = {
        (r.source, r.doc_id)
        for r in keyed.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 5")
        .collect()
    }
    shards = [
        keyed.filter(F.col("doc_id") % 2 == i)
        .withColumn("rk", F.row_number().over(w))
        .filter("rk <= 5")
        .drop("rk")
        for i in (0, 1)
    ]
    merged = {
        (r.source, r.doc_id)
        for r in shards[0]
        .unionByName(shards[1])
        .withColumn("rk", F.row_number().over(w))
        .filter("rk <= 5")
        .collect()
    }
    assert merged == glob


def test_target_encode_is_leakage_safe_and_consistent(spark, sf_dir):
    """Pin the two algebraic contracts: (a) each cell's out-of-fold
    encoding equals a direct recompute of the other folds' target
    mean; (b) the n_f-weighted average of ONE category's five in-fold
    means equals that category's global mean (partition identity) —
    which the encodings deliberately exclude per cell."""
    from quack_reduce_spark.inventory.mlprep import _md5_bucket, ml_target_encode

    out = ml_target_encode(spark, sf_dir).collect()
    assert len(out) == 25  # 5 priorities x 5 folds, all populated
    orders = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("cat"),
            _md5_bucket(F.col("o_orderkey").cast("string"), 5).alias("fold"),
            F.col("o_totalprice").alias("y"),
        )
        .collect()
    )
    import math

    def rnd2(x):
        return math.floor(x * 100 + 0.5) / 100

    by_cell = {}
    for r in orders:
        by_cell.setdefault((r.cat, r.fold), []).append(r.y)
    for r in out:
        others = [
            y
            for (cat, fold), ys in by_cell.items()
            if cat == r.cat and fold != r.fold
            for y in ys
        ]
        want = sum(others) / len(others)
        assert abs(rnd2(want) - r.enc_oof) < 0.02, (r, want)
        own = by_cell[(r.cat, r.fold)]
        assert len(own) == r.n_f
        gap = sum(own) / len(own) - want
        assert abs(rnd2(gap) - r.leakage_gap) < 0.02, (r, gap)
