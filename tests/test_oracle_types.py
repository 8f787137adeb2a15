"""Guard: no oracle may emit a DuckDB HUGEINT/INT128 column.

DuckDB's SUM over integer columns returns HUGEINT, which pandas
materializes as float64 (``57100.0``) while the Spark twin returns
int64 (``57100``); strict differential harnesses then hash the two
reprs differently and flag the query red even though the values are
identical (this is exactly what happened to ``ml_train_split`` in the
round-5 driver run). Every aggregate that could widen to HUGEINT must
carry an explicit ``CAST(... AS BIGINT)``.

DuckDB-only (no Spark session needed): we DESCRIBE every registered
oracle against views over the sf0.001 parquet and assert the declared
result types never include HUGEINT / INT128 / UHUGEINT.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BANNED = ("HUGEINT", "INT128", "UHUGEINT")


def _oracles():
    import __spark_entry__ as entry_mod

    return entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_emits_hugeint(con):
    bad = {}
    for name, sql in sorted(_oracles().items()):
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        offending = [
            (col, typ)
            for col, typ, *_ in rows
            if any(b in typ.upper() for b in BANNED)
        ]
        if offending:
            bad[name] = offending
    assert not bad, (
        "oracles emitting HUGEINT-class columns (pandas will float64 them "
        "and the driver hash will diverge from Spark's int64): "
        f"{bad} — wrap the aggregate in CAST(... AS BIGINT)"
    )
