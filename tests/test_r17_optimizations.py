"""Round-17 optimization contracts.

Three families:

- ``reuse_persist`` (operators/reuse.py): the persist-based swap for
  the r16 hot-path lazy localCheckpoints. The contract has two halves —
  (a) within one invocation the frame is materialized once and feeds
  every downstream branch (InMemoryTableScan in the plan, fault-
  tolerant lineage kept), and (b) a LATER invocation of the same site
  unpersists the previous entry, so reruns (bench reps, oracle passes)
  recompute from the parquet inputs instead of replaying the
  CacheManager's canonical-plan match — recompute-per-run semantics
  identical to the localCheckpoint it replaced.
- the verify-fence plan shape (r16 verdict #5): ``prefix_filter_pairs``
  relies on a CollectMetrics node stopping Catalyst from pushing the
  Jaccard threshold filter into the broadcast-join condition; pin that
  no ``array_intersect`` appears in any Join condition so a Spark
  upgrade that re-enables the pushdown is caught red.
- equality pins for this round's rewrites (dq_expectations single-pass,
  bloom one-action sizing) live beside their sites in this file.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from quack_reduce_spark.operators import dedup as D
from quack_reduce_spark.operators.reuse import _LIVE, reuse_persist


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "a completely different text about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_reuse_persist_unpersists_previous_entry(spark):
    # NOTE: DataFrame.storageLevel is a CacheManager lookup by
    # canonicalized plan, so the two invocations here use DIFFERENT
    # plans to make the entries distinguishable; for identical plans
    # the uncache-then-cache sequence empties and rebuilds the entry
    # the same way (unpersist removes the data either way).
    a = spark.range(10).withColumn("x", F.col("id") * 2)
    pa = reuse_persist(a, "__test_site")
    pa.count()  # materialize
    assert pa.storageLevel.useMemory
    b = spark.range(20).withColumn("x", F.col("id") * 3)
    pb = reuse_persist(b, "__test_site")
    # the previous invocation's entry is GONE (reruns recompute from
    # source — no unbounded cache growth across invocations) …
    assert not pa.storageLevel.useMemory
    # … and the new one is live
    pb.count()
    assert pb.storageLevel.useMemory
    assert _LIVE["__test_site"] is pb
    pb.unpersist()
    del _LIVE["__test_site"]


def test_reuse_persist_keeps_lineage_in_plan(spark):
    # persist (unlike localCheckpoint) keeps the full lineage: the
    # analyzed plan still reaches the range source, while the executed
    # plan reads the cache — both halves of the §5 trade-off
    df = reuse_persist(
        spark.range(100).withColumn("y", F.col("id") + 1), "__test_lineage"
    )
    df.count()
    executed = df._jdf.queryExecution().executedPlan().toString()
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "InMemoryTableScan" in executed
    assert "Range" in analyzed  # lineage intact → recompute-on-loss works
    df.unpersist()
    del _LIVE["__test_lineage"]


def test_minhash_plan_uses_inmemory_scan_not_existing_rdd(corpus):
    plan = (
        D.minhash_lsh_pairs(corpus, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the fused per-doc frame feeds 4 branches (band self-join x2 +
    # verify joins x2) — each reads the cache, not a recompute. (The
    # test corpus itself is a createDataFrame ExistingRDD, so the pin
    # is the InMemoryTableScan count, not ExistingRDD's absence.)
    assert plan.count("InMemoryTableScan") >= 2


def test_minhash_rerun_results_stable(corpus):
    # two invocations (the bench-rep pattern): identical results, and
    # the second invocation rebuilt its own materialization
    r1 = sorted(
        D.minhash_lsh_pairs(corpus, "text", "doc_id").collect()
    )
    r2 = sorted(
        D.minhash_lsh_pairs(corpus, "text", "doc_id").collect()
    )
    assert r1 == r2
    assert len(_LIVE) > 0  # at most one live entry per site is tracked


def test_prefix_verify_fence_plan_shape(corpus):
    # r16 verdict #5 + ADVICE: the observe-fence keeps the threshold
    # filter OUT of the verify join condition. If a Spark upgrade lets
    # Catalyst push filters through CollectMetrics again, the fat
    # rounded-Jaccard expression (array_intersect twice per candidate
    # pair) reappears in a Join condition — catch it here.
    df = D.prefix_filter_pairs(corpus, "text", "doc_id", threshold=0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan
    # fenced shape: the scoring Project computes array_intersect ONCE;
    # a regressed fence inlines it into the verify join condition and
    # the count jumps to 3 (two in the condition + one in the output)
    assert plan.count("array_intersect") == 1, (
        "threshold filter was pushed into the verify join condition — "
        "the CollectMetrics fence regressed:\n" + plan[:2000]
    )
    # ADVICE r16: the observation name is deterministic — the same
    # query rebuilt produces the same name (no module-global counter)
    df2 = D.prefix_filter_pairs(corpus, "text", "doc_id", threshold=0.5)
    assert df.semanticHash() == df2.semanticHash()
