"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference ``Makefile:27`` /
``README.md:100`` shape: scan → filter → group → count → sort → limit)
on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full SURVEY.md
§2 inventory implemented in ``quack_reduce_spark.inventory``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory import all_oracles, all_queries
from quack_reduce_spark.inventory.relational import a09_topk

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return a09_topk(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable
    query; keys absent here (MinHash/SimHash/sign-LSH/mapInPandas
    stubs) get the driver's rows-only check — see the module docstrings
    in quack_reduce_spark/inventory/ for why those are not
    SQL-expressible.
    """
    return all_oracles()
