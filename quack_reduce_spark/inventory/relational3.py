"""Tier-B batch 3: JSON, map, ordinal-explode, higher-order and unpivot
operators.

These complete the delegated-SQL surface of SURVEY §2 Tier B (reference
reaches them through the arbitrary-SQL passthrough, ``app.py:51``): the
JSON function family, MapType construction/explosion, positional UNNEST,
lambda higher-order functions over generated sequences, and UNPIVOT.

Scale notes (100 TB): every query here is a narrow projection followed
by a map-side transform — no shuffle beyond the final aggregate, and
the JSON/array work happens inside codegen'd Catalyst expressions, not
Python. ``from_json`` with an explicit schema avoids schema inference
scans; map/array explodes multiply rows map-side before the aggregate's
partial/final split, so no skew is introduced by the fan-out itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load, rnd


def b3_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse a JSON-string column with an explicit schema and aggregate
    an extracted field (events.props = '{"k": <int>}')."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.from_json(F.col("props"), "k INT").getField("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("null_k"),
        )
        .orderBy("event_type")
    )


def b3_to_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize a struct back to a JSON string (to_json ∘ struct)."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_type.select(
            "event_type",
            F.to_json(F.struct("event_type", "n")).alias("payload"),
        )
        .orderBy("event_type")
    )


def b3_posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional UNNEST: split document text to words with 0-based
    ordinality (posexplode)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        docs.select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
        )
        .filter(F.col("word") != "")
        .orderBy("doc_id", "pos")
    )


def b3_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType roundtrip: per-user event_type→count map built with
    map_from_entries(collect_list(struct)), then exploded back to rows.
    The map is the point — the oracle is the plain grouped count."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    maps = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    return maps.select(
        "user_id", F.explode(F.col("m")).alias("event_type", "cnt")
    ).orderBy("user_id", "event_type")


def b3_sequence_zip_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over a generated array: sequence →
    zip_with product → aggregate fold (sum of squares 1..n per nation)."""
    nation = load(spark, sf_dir, "nation")
    return (
        nation.withColumn("n", (F.col("n_nationkey") + 1).cast("int"))
        .withColumn(
            "sum_sq",
            F.expr(
                "aggregate(zip_with(sequence(1, n), sequence(1, n),"
                " (x, y) -> CAST(x AS BIGINT) * y), 0L, (acc, v) -> acc + v)"
            ),
        )
        .select("n_nationkey", "n", "sum_sq")
        .orderBy("n_nationkey")
    )


def b3_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long): lineitem measure columns melted to
    (measure, val) rows, then averaged per measure and return flag."""
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(rnd(F.avg("val"), 4).alias("avg_val"))
        .orderBy("l_returnflag", "measure")
    )


def b3_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): expand a month calendar
    series by recursion, then LEFT JOIN order counts per month —
    empty months survive with 0. Identical SQL runs on DuckDB.

    Scale: the recursive seed is tiny (one row per month, driver-side
    cardinality); each iteration is a LocalRelation union, and the only
    distributed work is the final join+aggregate against orders.
    """
    from quack_reduce_spark.inventory._util import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT DATE'1995-01-01'
            UNION ALL
            SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
            WHERE m < DATE'1996-12-01'
        )
        SELECT CAST(m AS TIMESTAMP) AS month_start, COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON trunc(o_orderdate, 'MM') = m
        GROUP BY 1
        """
    )


QUERIES = {
    "b3_recursive_cte": b3_recursive_cte,
    "b3_from_json_struct": b3_from_json_struct,
    "b3_to_json_struct": b3_to_json_struct,
    "b3_posexplode_words": b3_posexplode_words,
    "b3_map_roundtrip": b3_map_roundtrip,
    "b3_sequence_zip_aggregate": b3_sequence_zip_aggregate,
    "b3_unpivot_measures": b3_unpivot_measures,
}


ORACLES = {
    "b3_recursive_cte": """
        WITH RECURSIVE months(m) AS (
            SELECT DATE'1995-01-01'
            UNION ALL
            SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
            WHERE m < DATE'1996-12-01'
        )
        SELECT CAST(m AS TIMESTAMP) AS month_start, COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = CAST(m AS DATE)
        GROUP BY 1
    """,
    "b3_from_json_struct": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               COUNT(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END) AS null_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "b3_to_json_struct": """
        SELECT event_type,
               '{"event_type":"' || event_type || '","n":' || n || '}' AS payload
        FROM (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type)
        ORDER BY event_type
    """,
    "b3_posexplode_words": """
        SELECT * FROM (
            SELECT doc_id,
                   CAST(generate_subscripts(words, 1) - 1 AS INT) AS pos,
                   unnest(words) AS word
            FROM (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents WHERE doc_id < 20) t
        )
        WHERE word <> ''
        ORDER BY doc_id, pos
    """,
    "b3_map_roundtrip": """
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events
        WHERE user_id < 50
        GROUP BY user_id, event_type
        ORDER BY user_id, event_type
    """,
    "b3_sequence_zip_aggregate": """
        SELECT n_nationkey, CAST(n_nationkey + 1 AS INT) AS n,
               CAST(list_sum(list_transform(generate_series(1, n_nationkey + 1),
                                            x -> x * x)) AS BIGINT) AS sum_sq
        FROM nation
        ORDER BY n_nationkey
    """,
    "b3_unpivot_measures": """
        SELECT l_returnflag, measure,
               FLOOR(AVG(val) * 1e4 + 0.5) / 1e4 AS avg_val
        FROM (
            SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        )
        GROUP BY l_returnflag, measure
        ORDER BY l_returnflag, measure
    """,
}
