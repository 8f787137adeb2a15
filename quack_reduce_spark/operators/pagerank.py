"""PageRank on DataFrames — fixed-iteration power method.

The repo's graph family (duplicate-cluster resolution in
operators/components.py, dup-graph triangle stats) lacked a
centrality operator; PageRank is the canonical one for LLM-corpus
work (page/domain authority as a quality prior, citation weighting in
dedup-cluster canonical-doc selection).

Spark-first shape: ranks and out-degrees are (node, value) tables;
one iteration is

    contribs = edges ⋈ ranks/deg on src  →  groupBy dst sum
    rank'    = (1-d)/N + d * (contribs + dangling_mass/N)

with the dangling mass (rank parked on nodes with no out-edges)
redistributed uniformly — the standard correction that keeps ranks a
probability distribution on graphs like supplier→customer bipartite
trade where one side has no out-edges at all.

Scale: the per-iteration cost is ONE shuffle of the edge table keyed
on src (the join) plus one on dst (the aggregate). For many
iterations pre-partition AND cache the degree-annotated edge table on
src so the join side of every round reuses the same partitioning, and
truncate the rank lineage every few rounds (checkpoint) so the plan
does not grow with the iteration count. The dangling term is a
one-row scalar aggregate broadcast into the update — no driver loop
over nodes. Iterations are a fixed small number (power iteration
converges geometrically at rate ~damping); the fixed count is also
what makes the result EXACTLY reproducible in unrolled SQL, which is
how the registry entry is hash-oracled rather than rows-only.

No counterpart in the reference (756-line DuckDB Lambda client; no
graph surface).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Ranks after ``iters`` power-method rounds from a uniform start.

    ``edges`` is a directed edge list (duplicates should be
    pre-distinct'd if multiplicity is not meant to weight the edge —
    this function uses the rows as given). Returns (node, rank) for
    every node appearing as src or dst; ranks sum to 1.

    ``checkpoint_every``: truncate the rank lineage with an eager
    localCheckpoint every this-many rounds (0 disables). Without it
    the unrolled plan TREE grows exponentially with ``iters`` (each
    round references the previous rank frame three times), which
    ReuseExchange neutralizes at runtime but which still costs
    planning time and plan-size headroom at higher iteration counts;
    with it the plan depth is bounded by the checkpoint interval.
    The default stays at 4 — r16 measured per-round eager
    checkpoints 3-4x slower than the pipelined plan at bench scale
    (job barriers dominate; results are identical either way,
    tests/test_r16_optimizations.py) — (mirrors
    ``bfs_levels``' per-round frontier checkpoint). On a cluster use
    ``spark.sparkContext.setCheckpointDir`` + reliable checkpoints if
    executor loss during a long run must be survivable.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    # The edge table is referenced once per iteration (the contribs
    # join) on top of the nodes/out_deg builds, and the rank frame of
    # round k is referenced by round k+1 three times — the unrolled
    # plan TREE is exponential in ``iters`` (226 KB of explain at
    # iters=3). Runtime survives that because ReuseExchange dedupes
    # the identical shuffle subtrees: the repeated references replay
    # reused shuffle outputs, not the base join. r16 measured the
    # materializing alternatives and kept the pipelined plan: eager
    # per-round checkpoints ran 3-4x slower (five sequential job
    # barriers replace one job), and even a lazy checkpoint of this
    # edge list ran ~2x slower (persist + re-read of the wide rows
    # costs more than replaying the reused exchange) — guide §1,
    # measure first; §2.4, the exchange is already shared.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # cache: reused every iteration AND for N; at scale pre-partition
    # by node so the per-round joins co-locate
    nodes = nodes.cache()
    n_nodes = nodes.count()
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # degree-annotated nodes: deg NULL -> dangling
    nd = nodes.join(out_deg, "node", "left").cache()

    ranks = nd.select("node", "deg", F.lit(1.0 / n_nodes).alias("rank"))
    checkpointed = False
    for it in range(iters):
        # scalar dangling mass (one tiny aggregate, broadcast via
        # crossJoin of a 1-row frame — no driver round-trip)
        dangling = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        contribs = (
            e.join(
                ranks.select("node", (F.col("rank") / F.col("deg")).alias("__c")),
                e["src"] == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nd.join(contribs, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                "deg",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__dm") / n_nodes)
                ).alias("rank"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
            checkpointed = True
    out = ranks.select("node", "rank")
    if checkpointed:
        # the in-loop checkpoints already materialized everything the
        # caches feed, so release them now (short runs stay fully lazy
        # and keep their caches: evicting before first use would just
        # force a recompute); one final checkpoint makes the returned
        # frame independent of the released caches
        out = out.localCheckpoint(eager=True)
        nd.unpersist()
        nodes.unpersist()
    return out
