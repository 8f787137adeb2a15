"""Model-evaluation metrics inventory: confusion matrix and exact AUC
at corpus scale.

The readout side of the ML-prep pipeline: after nearest-centroid (or
any) classification, the confusion matrix says WHERE it fails, and
AUC says how well a score separates classes independent of any
threshold. Both are expressed so the heavy input is touched once and
the exact statistic is computed on an aggregated distribution:

- confusion: one broadcast-centroid scan + one (true, pred) aggregate;
- AUC: the Mann-Whitney identity evaluated over the DISTINCT-score
  distribution — scores aggregate to (score → n_pos, n_neg) first, so
  the rank window runs over the distribution's support (bounded by
  rounding), never over the raw corpus. Ranking 100 TB of raw rows in
  one window would be the single-task-sort scale-killer; ranking its
  aggregated score histogram is a few thousand rows regardless of
  corpus size. r16: the histogram prefix sum itself is range-bucketed
  (quantile boundaries + driver-cumulated per-bucket offsets), so the
  rank stage is shuffle-parallel too — no unpartitioned window
  anywhere in the plan.

Cross-engine FP discipline: scores are rounded (floor-half-up, 1e-6)
BEFORE grouping/ranking in BOTH engines, so last-ulp summation noise
cannot move a row across a rank boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from quack_reduce_spark.inventory._util import load, rnd

EMBED_DIM = 64
POS_LABEL_MIN = 5  # binary task: label >= 5 is the positive class


def _centroid_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, pred) via max-cosine nearest centroid — the
    same assignment sim_nearest_centroid oracles, kept as a shared
    building block."""
    from quack_reduce_spark.operators.similarity import cosine

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
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "clabel",
        # round before ranking: at a near-tie between two centroids a
        # last-ulp gap between Spark's fold-based cosine and DuckDB's
        # list_dot_product could flip the argmax; at 1e-6 both engines
        # see the same score and the clabel tiebreak is deterministic
        rnd(cosine(F.col("embedding"), F.col("cvec")), 6).alias("score"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("clabel").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "label", F.col("clabel").alias("pred"))
    )


def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the nearest-centroid classifier: one row
    per observed (true label, predicted label) pair with its count and
    row-normalized rate. The per-class accuracy sim_nearest_centroid
    reports is this matrix's diagonal; the OFF-diagonal structure —
    which classes bleed into which — is what actually guides fixing a
    classifier, and it costs the same two aggregates."""
    pred = _centroid_pred(spark, sf_dir)
    per_true = pred.groupBy("label").agg(F.count(F.lit(1)).alias("n_true"))
    return (
        pred.groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(per_true, "label")
        .select(
            "label",
            "pred",
            "n",
            rnd(F.col("n") / F.col("n_true"), 6).alias("rate"),
        )
        .orderBy("label", "pred")
    )


def ml_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of a scalar score (mean embedding component)
    separating labels >= 5 from the rest, via the Mann-Whitney
    identity AUC = Σ_s n_pos(s)·(N_neg_below(s) + n_neg(s)/2) /
    (P·N) evaluated on the distinct-score distribution (ties handled
    exactly by the half-term). The corpus collapses to its score
    histogram before any window runs — the aggregation-first shape
    that keeps exact rank statistics feasible at 100 TB."""
    emb = load(spark, sf_dir, "embeddings")
    score = rnd(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(EMBED_DIM)),
        6,
    )
    scored = emb.select(
        score.alias("s"),
        (F.col("label") >= POS_LABEL_MIN).cast("int").alias("is_pos"),
    )
    # lazy checkpoint: the histogram is consumed by THREE actions below
    # (bucket boundaries, per-bucket offsets, the final aggregate) —
    # materialize the embeddings scan once and pin the frame so all
    # three see byte-identical rows
    dist = (
        scored.groupBy("s")
        .agg(
            F.sum("is_pos").alias("n_pos"),
            F.sum(1 - F.col("is_pos")).alias("n_neg"),
        )
        .localCheckpoint(eager=False)
    )
    # Range-bucketed rank (r16, VERDICT r15 #5): the cumulative
    # neg-below sum previously ran as ONE unpartitioned Window — a
    # single-task sort over the whole score distribution. Replace it
    # with the zonemaps-listing trick: approximate score quantiles
    # pick ~n_buckets range boundaries; each row's bucket id is the
    # count of boundaries strictly below its score (a deterministic,
    # layout-independent range partitioning — ties share a bucket by
    # construction); per-bucket negative totals are cumulated
    # DRIVER-side (n_buckets rows) into offsets; the window then runs
    # partitioned by bucket, shuffle-parallel, and adds the offset.
    # neg_below(s) = (negs in earlier buckets) + (negs below s within
    # its bucket) — exactly the global prefix sum.
    n_buckets = 32
    qs = [i / n_buckets for i in range(1, n_buckets)]
    brow = dist.agg(F.percentile_approx("s", qs, 10000).alias("b")).first()
    bounds = sorted({float(b) for b in (brow["b"] or []) if b is not None})
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        pid = F.size(F.filter(barr, lambda b: b < F.col("s")))
    else:
        pid = F.lit(0)
    with_pid = dist.withColumn("pid", pid)
    per_pid = with_pid.groupBy("pid").agg(F.sum("n_neg").alias("t")).collect()
    offs: list[tuple[int, int]] = []
    run = 0
    for r in sorted(per_pid, key=lambda r: r["pid"]):
        offs.append((int(r["pid"]), run))
        run += int(r["t"] or 0)
    off_df = spark.createDataFrame(offs or [(0, 0)], "pid int, neg_off long")
    w = (
        Window.partitionBy("pid")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = with_pid.join(F.broadcast(off_df), "pid").select(
        (
            F.col("n_pos")
            * (
                F.coalesce(F.sum("n_neg").over(w), F.lit(0))
                + F.col("neg_off")
                + F.col("n_neg") / F.lit(2.0)
            )
        ).alias("u"),
        "n_pos",
        "n_neg",
    )
    return contrib.agg(
        F.sum("n_pos").cast("long").alias("n_positive"),
        F.sum("n_neg").cast("long").alias("n_negative"),
        rnd(
            F.sum("u") / (F.sum("n_pos") * F.sum("n_neg")),
            6,
        ).alias("auc"),
    )


QUERIES = {
    "ml_confusion_matrix": ml_confusion_matrix,
    "ml_auc_rank": ml_auc_rank,
}

_PRED_CTES = """
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
                   / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))
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
"""

ORACLES = {
    "ml_confusion_matrix": _PRED_CTES
    + """
        , per_true AS (
            SELECT label, COUNT(*) AS n_true FROM pred GROUP BY label
        )
        SELECT p.label, p.pred, CAST(COUNT(*) AS BIGINT) AS n,
               FLOOR((CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.n_true)) * 1e6
                     + 0.5) / 1e6 AS rate
        FROM pred p JOIN per_true t ON p.label = t.label
        GROUP BY p.label, p.pred
        ORDER BY p.label, p.pred
    """,
    "ml_auc_rank": """
        WITH scored AS (
            SELECT FLOOR((list_dot_product(CAST(embedding AS DOUBLE[]),
                                           [CAST(1.0 AS DOUBLE) FOR x IN embedding])
                          / 64.0) * 1e6 + 0.5) / 1e6 AS s,
                   CASE WHEN label >= 5 THEN 1 ELSE 0 END AS is_pos
            FROM embeddings
        ),
        dist AS (
            SELECT s, SUM(is_pos) AS n_pos, SUM(1 - is_pos) AS n_neg
            FROM scored GROUP BY s
        ),
        contrib AS (
            SELECT n_pos, n_neg,
                   n_pos * (COALESCE(SUM(n_neg) OVER (ORDER BY s
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0)
                            + n_neg / 2.0) AS u
            FROM dist
        )
        SELECT CAST(SUM(n_pos) AS BIGINT) AS n_positive,
               CAST(SUM(n_neg) AS BIGINT) AS n_negative,
               FLOOR((SUM(u) / (SUM(n_pos) * SUM(n_neg))) * 1e6 + 0.5) / 1e6
                   AS auc
        FROM contrib
    """,
}
