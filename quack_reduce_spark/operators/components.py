"""Connected components over a pair list (dedup-cluster resolution).

The missing last step of every near-dup pipeline: pair lists
(ngram-Jaccard / MinHash-LSH / SimHash emit (doc1, doc2) edges) must
become CLUSTERS, and each cluster one canonical survivor, before a
training corpus can actually drop duplicates. Transitivity does the
damage — A~B, B~C puts A,B,C in one cluster even though (A,C) was never
emitted as a pair — so this is a graph connectivity problem, not a
per-pair filter.

Algorithm: iterative min-label propagation (Pregel-style, the
standard map-reduce connected-components construction). Every node
starts labeled with itself; each round every node takes the min of its
own label and its neighbors' labels; fixpoint = components labeled by
their minimum member. Rounds needed = graph diameter, and near-dup
graphs are shallow (dense cliques of mutual duplicates, tiny diameter),
so the loop converges in a handful of rounds.

Scale (100 TB): each round is one keyed aggregate + one join, both
shuffling on node id — no all-pairs anything; the edge list stays
partitioned throughout. The driver-side loop only reads a scalar
convergence count per round (no data is collected). Lineage is cut
with localCheckpoint each round so 10 rounds don't stack 10 joins into
one plan. Label propagation doubles as the same primitive GraphFrames
uses; for graphs with giant diameters (not dedup graphs) the
large-star/small-star variant halves round count — noted, not needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "doc1",
    dst: str = "doc2",
    max_iter: int = 20,
    algorithm: str = "label_prop",
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable through the undirected pair graph.

    ``algorithm``:

    - ``"label_prop"`` (default): min-label propagation, one hop per
      round — rounds = graph diameter. The right choice for dedup
      graphs (dense near-clique clusters, diameter ≲ 5).
    - ``"two_phase"``: alternating large-star/small-star contraction
      (Kiveris et al., "Connected Components in MapReduce and
      Beyond"), converging in O(log d) rounds — the opt-in for
      high-diameter graphs (chain-shaped near-dup lineages, citation
      or link graphs) where label propagation would need hundreds of
      rounds. Each round is two keyed aggregates + joins on node id,
      the same shuffle discipline as label_prop.
    """
    if algorithm == "two_phase":
        return _two_phase_components(edges, src, dst, max_iter)
    if algorithm != "label_prop":
        raise ValueError(
            f"algorithm must be label_prop|two_phase, got {algorithm!r}"
        )
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = fwd.union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    adj = und.distinct().localCheckpoint(eager=False)

    labels = (
        adj.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            adj.join(labels, adj.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least("component", F.coalesce("nbr_min", "component")).alias(
                    "component"
                ),
                (F.coalesce("nbr_min", "component") < F.col("component")).alias(
                    "__changed"
                ),
            )
        ).localCheckpoint(eager=True)
        changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    if changed > 0:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing); the graph diameter "
            f"exceeds the round budget — raise max_iter (labels would be "
            f"partially propagated, i.e. WRONG, if returned silently)"
        )
    return labels


def _two_phase_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
) -> DataFrame:
    """Large-star/small-star alternation. Invariants per round:

    - large-star: every node u links each LARGER neighbor v to the
      minimum of u's closed neighborhood — strictly decreases the sum
      of parent pointers without disconnecting anything;
    - small-star: every node u re-points itself and all its
      not-larger neighbors at that minimum, producing star fragments.

    At fixpoint (small-star output unchanged) every edge is
    (node, component-min) directly — the paper proves O(log d)
    rounds. Convergence is checked EXACTLY (count + exceptAll), not
    by checksum, because a wrong early exit silently splits clusters.
    """
    all_nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iter):
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: m = min over closed neighborhood of u
        lmins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        lmins = lmins.select("u", F.least("u", "mn").alias("m"))
        large = (
            sym.join(lmins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the large-star output (re-symmetrized view is
        # unnecessary: large's edges already point child -> parent)
        sub = large.union(
            large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).filter(F.col("v") < F.col("u"))
        smins = sub.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            sub.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # exact fixpoint test: same edge set as last round
        if (
            small.count() == cur.count()
            and small.exceptAll(cur).count() == 0
        ):
            converged = True
            cur = small
            break
        cur = small
    if not converged:
        raise RuntimeError(
            f"two-phase connected components did not converge within "
            f"max_iter={max_iter} rounds — raise max_iter (edges would "
            f"be partially contracted, i.e. WRONG, if returned silently)"
        )
    parents = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return all_nodes.join(parents, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def canonical_docs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "doc1",
    dst: str = "doc2",
    algorithm: str = "label_prop",
) -> DataFrame:
    """(id, component, is_canonical): every doc in ``df`` mapped to its
    duplicate cluster (its own id when untouched by any pair); the
    cluster minimum survives — the deterministic keep-one policy.
    ``algorithm`` selects the connectivity engine (see
    connected_components); both produce identical labelings."""
    comp = connected_components(pairs, src, dst, algorithm=algorithm)
    ids = df.select(F.col(id_col).alias("__id"))
    return (
        ids.join(comp, ids["__id"] == comp["node"], "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("component", F.col("__id")).alias("component"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("component"))
    )
