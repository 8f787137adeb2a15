"""The oracle-tested query inventory (SURVEY.md §2).

Each submodule exposes ``QUERIES: dict[str, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL over the
pre-registered fixture views). Keys are prefixed by SURVEY §2 tier:

- ``a*``  — Tier A, operators the reference's own queries exercise
- ``b_*`` — Tier B, the delegated full-SQL surface (spark.sql parity)
- ``ts_*`` — time-series / windowing (events table; SURVEY §2 Tier C hook)
- ``text_*`` / ``dedup_*`` / ``sim_*`` / ``mm_*`` — north-star
  LLM-data-pipeline operators (BASELINE.json)

Queries without an oracle entry (non-SQL-expressible: MinHash-LSH,
SimHash, random-hyperplane LSH) get the driver's rows-only check and are
additionally unit-tested in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory import (
    approx,
    dedup,
    multimodal,
    relational,
    relational2,
    relational3,
    similarity,
    text,
    timeseries,
    tpch,
    tpch2,
    udfs,
)

_MODULES = [
    relational,
    relational2,
    relational3,
    tpch,
    tpch2,
    timeseries,
    text,
    dedup,
    similarity,
    multimodal,
    approx,
    udfs,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
