"""Python UDF surface: scalar pandas_udf, grouped-agg pandas_udf, UDTF.

The reference defines no UDFs (its dbt macros dir is an empty
.gitkeep — SURVEY §2 Tier C); Spark's UDF matrix is part of the
delegated surface a user would expect. Discipline (the 100 TB rule):
UDFs are the slow path — everything that CAN be a built-in expression
in this repo IS one (functions/text.py, functions/numeric.py); these
exist to prove the full matrix works and to host logic that genuinely
needs Python (model scoring, library calls):

- scalar pandas_udf      → Arrow-batched, vectorized numpy body
- grouped-agg pandas_udf → one pandas Series per group, returns scalar
- UDTF (table function)  → one input row fans out to N typed rows

Each has an exact SQL twin so the DuckDB oracle can verify it.

UDF objects are created LAZILY (first use), because pandas_udf/udtf
parse their DDL return types against the active SparkSession — a
module-level decorator would make importing this package require a
running session.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf, udtf

_cache: dict[str, object] = {}


def _sigmoid_impl(x: pd.Series) -> pd.Series:
    return 1.0 / (1.0 + np.exp(-4.0 * (x - 0.5)))


def _trimmed_mean_impl(v: pd.Series) -> float:
    s = v.sort_values()
    if len(s) > 4:
        s = s.iloc[2:-2]
    return float(s.mean())


class TokenizeUDTF:
    """Python UDTF: one document row fans out to (pos, token) rows.
    Row-at-a-time by construction — the mapInPandas tokenizers in
    multimodal/ and the JVM explode in operators/dedup.py are the fast
    paths; this exists to cover the UDTF API surface."""

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split()):
            yield (i, tok)


def sigmoid_calibrate(col: Column | str) -> Column:
    """Vectorized logistic calibration 1/(1+exp(-4*(x-0.5))): maps a
    [0,1] heuristic score onto a steeper confidence curve (the shape
    of a model-based quality scorer's output head)."""
    if "sigmoid" not in _cache:
        _cache["sigmoid"] = pandas_udf(_sigmoid_impl, "double")
    return _cache["sigmoid"](col)


def trimmed_mean(col: Column | str) -> Column:
    """Grouped-agg pandas UDF: mean after dropping the 2 smallest and
    2 largest values (position-trimmed, so engines agree even under
    ties); plain mean for groups of <= 4."""
    if "tmean" not in _cache:
        _cache["tmean"] = pandas_udf(_trimmed_mean_impl, "double")
    return _cache["tmean"](col)


def tokenize_udtf():
    """The UDTF object (lazily typed)."""
    if "udtf" not in _cache:
        _cache["udtf"] = udtf(TokenizeUDTF, returnType="pos int, token string")
    return _cache["udtf"]


def register_udfs(spark) -> None:
    """Register the UDF surface for SQL use (idempotent)."""
    if "sigmoid" not in _cache:
        _cache["sigmoid"] = pandas_udf(_sigmoid_impl, "double")
    if "tmean" not in _cache:
        _cache["tmean"] = pandas_udf(_trimmed_mean_impl, "double")
    spark.udf.register("sigmoid_calibrate", _cache["sigmoid"])
    spark.udf.register("trimmed_mean_udaf", _cache["tmean"])
    spark.udtf.register("tokenize_udtf", tokenize_udtf())
