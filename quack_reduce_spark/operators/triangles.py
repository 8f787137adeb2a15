"""Triangle counting via degree-ordered edge orientation.

The canonical scalable formulation (node-iterator++ / the MapReduce
algorithm of Suri & Vassilvitskii "Counting Triangles and the Curse of
the Last Reducer", WWW'11 — public literature): orient every
undirected edge from its lower-(degree, id) endpoint to the higher
one, then count length-2 oriented paths a→b→c whose closing edge a→c
exists. Each triangle is counted EXACTLY once (its unique
degree-ordered orientation), and the join fan-out per node is bounded
by its ORIENTED out-degree ≤ O(sqrt(m)) on any graph (arboricity
bound) — the skew cap that makes the join survive power-law degree
distributions at 100 TB, where the naive undirected wedge join melts
on the hottest node.

All steps are plain relational algebra (degree aggregate, two hash
joins), so Catalyst plans ordinary shuffled hash/sort-merge joins and
a DuckDB oracle can replay the count exactly.

Reference note: the reference repo has no graph surface (its engine is
DuckDB SQL passthrough, app.py:51); this is north-star scope alongside
operators/pagerank.py and bfs.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def undirected_edges(df: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Canonicalize an edge list to distinct undirected edges with
    a < b (drops self-loops and duplicate orientations)."""
    return (
        df.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge from the lower-(degree, id) endpoint
    to the higher — the total order that gives every triangle exactly
    one source node and caps per-node out-degree at O(sqrt(m))."""
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        edges.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )


def triangle_counts(df: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle participation counts (node, n_triangles).

    Wedge join on the oriented edges (src→b1, src→b2 with b1 < b2 by
    the same (deg, id) order — i.e. a self-join of out-neighbor lists)
    closed against the oriented edge set; every triangle surfaces once
    and credits all three of its corners. Nodes in no triangle are
    absent (SQL GROUP BY semantics — the oracle matches).
    """
    # the edge list is referenced three times (degree aggregate + two
    # orientation joins) and the oriented list three more (wedge
    # self-join + closing join); Spark never shares subtrees across
    # references, so materialize both once — they are the REDUCED
    # graph (distinct node pairs), tiny next to the base tables.
    # r17 REJECTED experiments (measured, reverted): replacing these
    # EAGER localCheckpoints with persist ran ~2x slower at sf0.1,
    # both lazy (ctrl mins 1.053/1.028 vs 2.387/2.117) and eager via
    # count() (ctrl 1.229/1.167 vs 2.381/2.472). Two mechanisms, both
    # verified in the plans: (a) the built cache exposes SMALL size
    # stats (~2.6 MB at sf0.1), so the planner broadcasts the oriented
    # list into the wedge + closing joins (plan probe: SMJ x2 under
    # checkpoint -> BHJ under persist) — a strategy that loses here
    # because every reference of the fan-out self-join also pays (b)
    # columnar cache DECODE per read, where the checkpointed RDD hands
    # back ready UnsafeRows. On a cluster where executor loss matters,
    # use reliable checkpoints here instead.
    edges = undirected_edges(df, a, b).localCheckpoint(eager=True)
    o = oriented_edges(edges).localCheckpoint(eager=True)
    # wedges: two oriented out-edges of the same apex; order the pair
    # ends by the orientation itself (b1 "before" b2 in the oriented
    # order ⇔ edge b1→b2 could exist) — closing edge then matches in
    # ONE direction only, so no triangle is double-counted
    w = (
        o.select(F.col("src").alias("apex"), F.col("dst").alias("b1"))
        .join(o.select(F.col("src").alias("apex"), F.col("dst").alias("b2")), "apex")
        .filter(F.col("b1") != F.col("b2"))
    )
    tri = w.join(
        o.select(F.col("src").alias("b1"), F.col("dst").alias("b2")),
        ["b1", "b2"],
    ).select(F.col("apex").alias("n1"), F.col("b1").alias("n2"), F.col("b2").alias("n3"))
    corners = (
        tri.select(F.col("n1").alias("node"))
        .unionAll(tri.select(F.col("n2").alias("node")))
        .unionAll(tri.select(F.col("n3").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
