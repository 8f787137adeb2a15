"""Numeric helpers shared across operators and the query inventory."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def rnd(col: Column, n: int) -> Column:
    """Engine-portable half-up rounding: floor(x*10^n + 0.5)/10^n.

    Spark's ``round()`` rounds the shortest decimal repr via BigDecimal
    (HALF_UP) while DuckDB rounds the raw double — they disagree on
    boundary values like 38.37875. This closed form runs the identical
    IEEE ops in both engines (the SQL oracles use
    ``FLOOR((x) * 1eN + 0.5) / 1eN``), so results match bit-for-bit.
    """
    scale = F.lit(float(10**n))
    return F.floor(col * scale + F.lit(0.5)) / scale
