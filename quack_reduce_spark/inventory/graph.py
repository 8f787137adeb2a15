"""Graph-analytics inventory: PageRank over the trade graph.

Complements the dedup-graph operators (connected components,
triangle stats) with a centrality measure. The graph is the
supplier→customer bipartite trade network derived from
lineitem ⋈ orders (customer node ids offset by 1e6 so the two key
spaces cannot collide). Three power-method rounds with damping 0.85
and uniform dangling-mass redistribution — a FIXED iteration count,
which is what lets the oracle replay the identical computation as
three unrolled SQL stages and hash-match every rank (the same
fixed-rounds trick the two-phase connected-components oracle uses).

Float discipline: every constant in the oracle is CAST AS DOUBLE and
combined with the same IEEE ops Python/Spark execute — in particular
``(1.0 - 0.85)`` is written as a subtraction, not the literal 0.15,
because those differ in the last ulp and the driver hashes rounded
values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load, rnd
from quack_reduce_spark.operators.pagerank import pagerank

_OFFSET = 1_000_000


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + F.lit(_OFFSET)).alias("dst"),
        )
        .distinct()
    )


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round damped PageRank on the supplier→customer trade graph
    (all customers are dangling nodes — the uniform-redistribution
    path is load-bearing, not decorative). Every node's rank is
    hash-oracled against the unrolled-SQL replay."""
    pr = pagerank(_trade_edges(spark, sf_dir), iters=3, damping=0.85)
    return pr.select("node", rnd(F.col("rank"), 7).alias("rank"))


def graph_pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 suppliers by trade-graph PageRank joined back to the
    supplier dimension — the 'which sources carry authority' readout a
    corpus pipeline uses as a quality prior. Deterministic tiebreak on
    the key."""
    pr = pagerank(_trade_edges(spark, sf_dir), iters=3, damping=0.85)
    sup = load(spark, sf_dir, "supplier")
    return (
        pr.filter(F.col("node") < _OFFSET)
        .join(sup, pr["node"] == sup["s_suppkey"])
        .select("s_suppkey", "s_name", rnd(F.col("rank"), 7).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("s_suppkey").asc())
        .limit(10)
    )


def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-hop BFS distances from suppliers {1,2,3} on the
    UNDIRECTED trade graph — the 'blast radius' primitive behind
    contamination tracing (how far does a tainted source's influence
    reach through shared customers?). Every (node, dist) row is
    hash-oracled against a 3-stage unrolled-SQL frontier replay."""
    from quack_reduce_spark.operators.bfs import bfs_levels, undirect

    edges = undirect(_trade_edges(spark, sf_dir))
    seeds = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 3)
        .select(F.col("s_suppkey").alias("node"))
    )
    return bfs_levels(edges, seeds, rounds=3)


def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hop reach profile of the same BFS: node counts per distance
    split by side of the bipartition (supplier vs customer). The
    readout a pipeline checks before trusting a contamination cutoff
    ('95% of the graph is within 2 hops' means hop-based quarantine
    is meaningless)."""
    from quack_reduce_spark.operators.bfs import bfs_levels, undirect

    edges = undirect(_trade_edges(spark, sf_dir))
    seeds = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 3)
        .select(F.col("s_suppkey").alias("node"))
    )
    return (
        bfs_levels(edges, seeds, rounds=3)
        .groupBy("dist")
        .agg(
            F.sum(F.when(F.col("node") < _OFFSET, 1).otherwise(0)).alias(
                "n_suppliers"
            ),
            F.sum(F.when(F.col("node") >= _OFFSET, 1).otherwise(0)).alias(
                "n_customers"
            ),
        )
        .orderBy("dist")
    )


TRIANGLE_QTY_MIN = 48


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by triangle participation in the high-quantity
    co-supply graph (suppliers co-occurring on an order with
    l_quantity >= TRIANGLE_QTY_MIN — the cut keeps the projection sparse; the
    unfiltered order-projection of TPC-H is near-complete and
    triangle-degenerate). Counting uses degree-ordered edge
    orientation (operators/triangles.py — Suri & Vassilvitskii's
    MapReduce formulation): each triangle is found exactly once from
    its lowest-(degree, id) corner and the wedge join's fan-out is
    bounded by oriented out-degree ≤ O(sqrt(m)), the cap that
    survives power-law hubs at 100 TB. Every step is relational
    (degree aggregate + two equi-joins), so the DuckDB oracle replays
    the identical count."""
    from quack_reduce_spark.operators.triangles import triangle_counts

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= TRIANGLE_QTY_MIN)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
        # both self-join sides reference this reduced frame; its
        # distinct exchange is canonically identical on both sides, so
        # ReuseExchange shares the shuffle — an r16 A/B measured a
        # lazy checkpoint here as a wash and kept the simpler plan
    )
    x = li.select("ok", F.col("s").alias("sa"))
    y = li.select("ok", F.col("s").alias("sb"))
    pairs = (
        x.join(y, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("a"), F.col("sb").alias("b"))
    )
    return (
        triangle_counts(pairs)
        .orderBy(F.col("n_triangles").desc(), F.col("node").asc())
        .limit(20)
    )


QUERIES = {
    "graph_pagerank": graph_pagerank,
    "graph_pagerank_top": graph_pagerank_top,
    "graph_bfs_layers": graph_bfs_layers,
    "graph_bfs_reach": graph_bfs_reach,
    "graph_triangles": graph_triangles,
}


_PR_CTES = """
        WITH e AS (
            SELECT DISTINCT l.l_suppkey AS src,
                   o.o_custkey + 1000000 AS dst
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
        nd AS (
            SELECT nodes.node, deg.deg FROM nodes LEFT JOIN deg USING (node)
        ),
        r0 AS (
            SELECT node, deg, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
            FROM nd
        ),
        d1 AS (SELECT COALESCE(SUM(rank), CAST(0 AS DOUBLE)) AS dm FROM r0 WHERE deg IS NULL),
        c1 AS (
            SELECT e.dst AS node, SUM(r.rank / r.deg) AS cin
            FROM e JOIN r0 r ON e.src = r.node GROUP BY e.dst
        ),
        r1 AS (
            SELECT nd.node, nd.deg,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE)
                     * (COALESCE(c1.cin, CAST(0 AS DOUBLE))
                        + (SELECT dm FROM d1) / (SELECT n FROM nn)) AS rank
            FROM nd LEFT JOIN c1 ON nd.node = c1.node
        ),
        d2 AS (SELECT COALESCE(SUM(rank), CAST(0 AS DOUBLE)) AS dm FROM r1 WHERE deg IS NULL),
        c2 AS (
            SELECT e.dst AS node, SUM(r.rank / r.deg) AS cin
            FROM e JOIN r1 r ON e.src = r.node GROUP BY e.dst
        ),
        r2 AS (
            SELECT nd.node, nd.deg,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE)
                     * (COALESCE(c2.cin, CAST(0 AS DOUBLE))
                        + (SELECT dm FROM d2) / (SELECT n FROM nn)) AS rank
            FROM nd LEFT JOIN c2 ON nd.node = c2.node
        ),
        d3 AS (SELECT COALESCE(SUM(rank), CAST(0 AS DOUBLE)) AS dm FROM r2 WHERE deg IS NULL),
        c3 AS (
            SELECT e.dst AS node, SUM(r.rank / r.deg) AS cin
            FROM e JOIN r2 r ON e.src = r.node GROUP BY e.dst
        ),
        r3 AS (
            SELECT nd.node, nd.deg,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE)
                     * (COALESCE(c3.cin, CAST(0 AS DOUBLE))
                        + (SELECT dm FROM d3) / (SELECT n FROM nn)) AS rank
            FROM nd LEFT JOIN c3 ON nd.node = c3.node
        )
"""

_BFS_CTES = """
        WITH e0 AS (
            SELECT DISTINCT CAST(l.l_suppkey AS BIGINT) AS src,
                   CAST(o.o_custkey + 1000000 AS BIGINT) AS dst
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        e AS (
            SELECT src, dst FROM e0
            UNION
            SELECT dst AS src, src AS dst FROM e0
        ),
        l0 AS (
            SELECT CAST(s_suppkey AS BIGINT) AS node
            FROM supplier WHERE s_suppkey <= 3
        ),
        f1 AS (
            SELECT DISTINCT e.dst AS node
            FROM e JOIN l0 ON e.src = l0.node
            WHERE e.dst NOT IN (SELECT node FROM l0)
        ),
        f2 AS (
            SELECT DISTINCT e.dst AS node
            FROM e JOIN f1 ON e.src = f1.node
            WHERE e.dst NOT IN (SELECT node FROM l0)
              AND e.dst NOT IN (SELECT node FROM f1)
        ),
        f3 AS (
            SELECT DISTINCT e.dst AS node
            FROM e JOIN f2 ON e.src = f2.node
            WHERE e.dst NOT IN (SELECT node FROM l0)
              AND e.dst NOT IN (SELECT node FROM f1)
              AND e.dst NOT IN (SELECT node FROM f2)
        ),
        layers AS (
            SELECT node, 0 AS dist FROM l0
            UNION ALL SELECT node, 1 FROM f1
            UNION ALL SELECT node, 2 FROM f2
            UNION ALL SELECT node, 3 FROM f3
        )
"""

ORACLES = {
    # exact replay of the degree-ordered orientation: same (deg, id)
    # total order, same wedge + closing-edge joins, so the per-node
    # counts (not just the global total) must hash-match. The quantity
    # cut is interpolated from TRIANGLE_QTY_MIN so editing the
    # constant can never desynchronize query from oracle.
    "graph_triangles": f"""
        WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
            FROM lineitem WHERE l_quantity >= {TRIANGLE_QTY_MIN}
        ),
        raw AS (
            SELECT DISTINCT x.s AS a, y.s AS b
            FROM li x JOIN li y ON x.ok = y.ok AND x.s < y.s
        ),
        deg AS (
            SELECT node, COUNT(*) AS d FROM (
                SELECT a AS node FROM raw UNION ALL SELECT b FROM raw
            ) GROUP BY node
        ),
        o AS (
            SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND r.a < r.b)
                        THEN r.a ELSE r.b END AS src,
                   CASE WHEN da.d < db.d OR (da.d = db.d AND r.a < r.b)
                        THEN r.b ELSE r.a END AS dst
            FROM raw r
            JOIN deg da ON r.a = da.node
            JOIN deg db ON r.b = db.node
        ),
        tri AS (
            SELECT w1.src AS n1, w1.dst AS n2, w2.dst AS n3
            FROM o w1
            JOIN o w2 ON w1.src = w2.src AND w1.dst <> w2.dst
            JOIN o c ON c.src = w1.dst AND c.dst = w2.dst
        ),
        corners AS (
            SELECT n1 AS node FROM tri
            UNION ALL SELECT n2 FROM tri
            UNION ALL SELECT n3 FROM tri
        )
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY node
        ORDER BY n_triangles DESC, node ASC
        LIMIT 20
    """,
    "graph_bfs_layers": _BFS_CTES + """
        SELECT node, dist FROM layers
    """,
    "graph_bfs_reach": _BFS_CTES + """
        SELECT dist,
               CAST(SUM(CASE WHEN node < 1000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_suppliers,
               CAST(SUM(CASE WHEN node >= 1000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_customers
        FROM layers
        GROUP BY dist
        ORDER BY dist
    """,
    "graph_pagerank": _PR_CTES
    + """
        SELECT node, FLOOR(rank * 1e7 + 0.5) / 1e7 AS rank FROM r3
    """,
    "graph_pagerank_top": _PR_CTES
    + """
        SELECT s.s_suppkey, s.s_name,
               FLOOR(r3.rank * 1e7 + 0.5) / 1e7 AS rank
        FROM r3 JOIN supplier s ON r3.node = s.s_suppkey
        WHERE r3.node < 1000000
        ORDER BY rank DESC, s.s_suppkey ASC
        LIMIT 10
    """,
}
