"""Python-UDF-surface inventory (scalar pandas_udf / grouped-agg
pandas_udf / UDTF), each with an exact SQL oracle.

These deliberately exercise the SLOW path (SURVEY §2 Tier C notes the
reference defines no UDFs; Spark users expect the full matrix). The
closed forms are chosen so DuckDB can recompute them exactly:
position-trimmed means are tie-stable, the logistic calibration takes
an already-6-decimal-rounded input, and the UDTF's whitespace split
matches string_split_regex on trimmed non-empty text.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.functions import text as T
from quack_reduce_spark.functions.udfs import register_udfs, sigmoid_calibrate, trimmed_mean
from quack_reduce_spark.inventory._util import load, rnd


def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized plain Python UDF (``useArrow=True`` — the Spark
    4 fast path for row-at-a-time Python logic: Arrow batch transfer
    without the pandas_udf signature change). Vowel-count feature per
    doc; the oracle recomputes it with pure SQL regexp counting."""

    @F.udf("int", useArrow=True)
    def vowel_count(s: str) -> int:
        return sum(1 for ch in s if ch in "aeiou")

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        vowel_count(F.col("text")).alias("n_vowels"),
        F.length("text").alias("n_chars_text"),
    )


def udf_quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf over a JVM-computed feature: logistic
    calibration of the heuristic quality score (Arrow-batched numpy)."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))
    return scored.select(
        "doc_id", "quality", rnd(sigmoid_calibrate("quality"), 6).alias("calibrated")
    )


def udf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf: position-trimmed mean of order totals
    per status (drop 2 smallest + 2 largest per group)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(rnd(trimmed_mean("o_totalprice"), 4).alias("tmean"))
        .orderBy("o_orderstatus")
    )


def udf_tokenize_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF lateral join: every document fans out to (pos, token)
    rows through a Python table function."""
    register_udfs(spark)
    load(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    ).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, u.pos, u.token FROM __udtf_docs, LATERAL tokenize_udtf(text) u"
    )


QUERIES = {
    "udf_arrow_scalar": udf_arrow_scalar,
    "udf_quality_calibrated": udf_quality_calibrated,
    "udf_trimmed_mean": udf_trimmed_mean,
    "udf_tokenize_rows": udf_tokenize_rows,
}


ORACLES = {
    "udf_arrow_scalar": """
        SELECT doc_id,
               CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS n_vowels,
               CAST(length(text) AS INT) AS n_chars_text
        FROM documents
    """,
    "udf_quality_calibrated": """
        WITH t AS (
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_tok,
                   len(list_filter(string_split_regex(trim(text), '\\s+'),
                                   x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS n_sw
            FROM documents
        ),
        q AS (
            SELECT doc_id,
                   FLOOR(((LEAST(CAST(n_tok AS DOUBLE) / 50.0, 1.0)
                          + (1.0 - LEAST(ABS(FLOOR((CAST(n_sw AS DOUBLE) / n_tok) * 1e6 + 0.5) / 1e6 - 0.4) * 2.0, 1.0))) / 2.0) * 1e6 + 0.5) / 1e6 AS quality
            FROM t
        )
        SELECT doc_id, quality,
               FLOOR((1.0 / (1.0 + exp(-4.0 * (quality - 0.5)))) * 1e6 + 0.5) / 1e6 AS calibrated
        FROM q
    """,
    "udf_trimmed_mean": """
        WITH ranked AS (
            SELECT o_orderstatus, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
            FROM orders
        )
        SELECT o_orderstatus,
               FLOOR((AVG(o_totalprice)) * 1e4 + 0.5) / 1e4 AS tmean
        FROM ranked
        WHERE cnt <= 4 OR (rn > 2 AND rn <= cnt - 2)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "udf_tokenize_rows": """
        -- static series: fixture docs are < 512 tokens
        SELECT d.doc_id,
               CAST(s.i AS INT) AS pos,
               d.toks[CAST(s.i AS INT) + 1] AS token
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM documents WHERE length(trim(text)) > 0) d
        CROSS JOIN generate_series(0, 511) AS s(i)
        WHERE s.i < len(d.toks)
    """,
}
