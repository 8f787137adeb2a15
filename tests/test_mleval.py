

def test_confusion_matrix_consistency(spark, sf_dir):
    from quack_reduce_spark.inventory import mleval
    from quack_reduce_spark.inventory._util import load

    out = mleval.ml_confusion_matrix(spark, sf_dir).collect()
    total = sum(r.n for r in out)
    assert total == load(spark, sf_dir, "embeddings").count()
    # row-normalized rates sum to ~1 per true label
    from collections import defaultdict

    per_label = defaultdict(float)
    for r in out:
        per_label[r.label] += r.rate
    assert all(abs(v - 1.0) < 1e-3 for v in per_label.values())
    # the classifier is better than random: diagonal dominates
    diag = sum(r.n for r in out if r.label == r.pred)
    assert diag / total > 1.0 / len(per_label)


def test_auc_matches_sklearn_style_reference(spark):
    import numpy as np

    from quack_reduce_spark.inventory import mleval

    # reuse the registry computation at sf0.001 and recompute AUC in
    # numpy from the same raw embeddings
    sf = "/root/testdata/sf0.001"
    row = mleval.ml_auc_rank(spark, sf).collect()[0]
    from quack_reduce_spark.inventory._util import load

    emb = load(spark, sf, "embeddings").collect()
    scores = np.array([
        float(np.floor((sum(float(np.float64(x)) for x in r["embedding"]) / 64.0) * 1e6 + 0.5) / 1e6)
        for r in emb
    ])
    y = np.array([1 if r["label"] >= 5 else 0 for r in emb])
    pos, neg = scores[y == 1], scores[y == 0]
    # exact Mann-Whitney with half-credit for ties
    u = sum((pos > n).sum() + 0.5 * (pos == n).sum() for n in neg)
    want = u / (len(pos) * len(neg))
    assert row.n_positive == int(y.sum())
    assert abs(row.auc - want) < 2e-6


def test_auc_rank_stage_is_partitioned(spark):
    """r16 (VERDICT r15 #5): the neg-below prefix sum runs as a
    PARTITIONED window (bucket id from quantile boundaries, offsets
    cumulated driver-side) — no `WindowExec: No Partition Defined`
    single-task sort anywhere in the AUC plan, and the real data
    spreads over >1 bucket."""
    from quack_reduce_spark.inventory import mleval

    sf = "/root/testdata/sf0.001"
    df = mleval.ml_auc_rank(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            # Spark prints an UNpartitioned spec as
            # windowspecdefinition(s ASC ...) — partitioned specs lead
            # with the partition columns before the sort spec
            assert "windowspecdefinition(pid#" in line, line
    # the bucketing is real: >1 distinct bucket id on the fixture
    import pyspark.sql.functions as F

    from quack_reduce_spark.inventory._util import load, rnd

    emb = load(spark, sf, "embeddings")
    score = rnd(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(mleval.EMBED_DIM)),
        6,
    )
    n_distinct = emb.select(score.alias("s")).distinct().count()
    assert n_distinct > 32  # enough support for >1 bucket
    # and the plan's Window input really is hash-partitioned on pid
    assert "hashpartitioning(pid#" in plan
