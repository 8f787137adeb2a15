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


QUERIES = {
    "graph_pagerank": graph_pagerank,
    "graph_pagerank_top": graph_pagerank_top,
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

ORACLES = {
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
