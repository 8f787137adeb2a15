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
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable through the undirected pair graph."""
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


def canonical_docs(
    df: DataFrame, pairs: DataFrame, id_col: str, src: str = "doc1", dst: str = "doc2"
) -> DataFrame:
    """(id, component, is_canonical): every doc in ``df`` mapped to its
    duplicate cluster (its own id when untouched by any pair); the
    cluster minimum survives — the deterministic keep-one policy."""
    comp = connected_components(pairs, src, dst)
    ids = df.select(F.col(id_col).alias("__id"))
    return (
        ids.join(comp, ids["__id"] == comp["node"], "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("component", F.col("__id")).alias("component"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("component"))
    )
