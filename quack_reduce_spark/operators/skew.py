"""Skew-mitigation join (100 TB discipline, SURVEY §4 / BASELINE.json).

AQE's skew-join splitting handles sort-merge skew automatically; this
operator covers the case AQE can't: a *broadcast-infeasible* dimension
joined on a key where a handful of values dominate the fact side
(power-law user_ids, null-ish defaults). Classic salting:

  fact:  key -> (key, salt = hash(row) % N)
  dim:   each row replicated N times, one per salt value

The join key becomes (key, salt), splitting each hot key's rows across
N tasks. Replication cost is |dim| * N, so N trades skew headroom
against dim duplication — both sides stay fully distributed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on column ``on``, salting the key
    into ``salt_buckets`` sub-keys. Result equals ``fact.join(dim, on,
    how)`` for 'inner'/'left' joins on a dim whose ``on`` is unique.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (dim side must not be preserved)")
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    salted_dim = dim.withColumn("__salt", salts)
    joined = salted_fact.join(salted_dim, [on, "__salt"], how)
    return joined.drop("__salt")
