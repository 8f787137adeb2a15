"""Differential SQL fuzzing: randomly-generated dialect-neutral queries
must return identical results from Spark SQL and DuckDB on the same
parquet fixture (the reference's 3-way differential assert,
benchmark.py:116, generalized into a property — SURVEY §5).

The grammar sticks to the ANSI intersection both engines parse
identically: comparison/IN/BETWEEN predicates over int/string/date
columns, AND/OR combinations, grouped COUNT/MIN/MAX/SUM aggregates
(integer sums cast to BIGINT to absorb DuckDB's HUGEINT promotion).
Floats only appear under MIN/MAX (no sum-order nondeterminism).
"""

from __future__ import annotations

import datetime
import random

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

INT_COLS = ["l_orderkey", "l_suppkey", "l_linenumber", "l_partkey"]
STR_COLS = ["l_returnflag", "l_linestatus"]
DBL_COLS = ["l_quantity", "l_discount", "l_extendedprice"]
DATE_COL = "l_shipdate"


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, int):
        return f"{float(v):.9g}"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)[:10]
    return str(v)


def _rowset(rows, cols):
    return sorted("|".join(_norm(r[c]) for c in cols) for r in rows)


def _gen_query(rng: random.Random) -> str:
    preds = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["int_cmp", "str_in", "date_range", "between"])
        if kind == "int_cmp":
            col = rng.choice(INT_COLS)
            op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
            preds.append(f"{col} {op} {rng.randint(1, 6000)}")
        elif kind == "str_in":
            col = rng.choice(STR_COLS)
            vals = {"l_returnflag": ["A", "N", "R"],
                    "l_linestatus": ["O", "F"]}[col]
            chosen = rng.sample(vals, rng.randint(1, min(3, len(vals))))
            quoted = ", ".join(f"'{v}'" for v in chosen)
            preds.append(f"{col} IN ({quoted})")
        elif kind == "date_range":
            y = rng.randint(1992, 1998)
            m = rng.randint(1, 12)
            preds.append(f"{DATE_COL} >= DATE '{y}-{m:02d}-01'")
        else:
            col = rng.choice(DBL_COLS)
            lo = rng.randint(0, 40)
            preds.append(f"{col} BETWEEN {lo} AND {lo + rng.randint(1, 30)}")
    where = " AND ".join(f"({p})" for p in preds) if rng.random() < 0.7 else " OR ".join(
        f"({p})" for p in preds
    )

    group_col = rng.choice(STR_COLS + ["l_linenumber"])
    aggs = ["COUNT(*) AS n"]
    if rng.random() < 0.7:
        c = rng.choice(INT_COLS)
        aggs.append(f"CAST(SUM({c}) AS BIGINT) AS sum_{c}")
    if rng.random() < 0.5:
        c = rng.choice(DBL_COLS)
        aggs.append(f"MIN({c}) AS min_{c}")
    if rng.random() < 0.5:
        c = rng.choice(INT_COLS)
        aggs.append(f"MAX({c}) AS max_{c}")
    return (
        f"SELECT {group_col}, {', '.join(aggs)} FROM lineitem "
        f"WHERE {where} GROUP BY {group_col}"
    )


@pytest.fixture(scope="module")
def engines(spark):
    from quack_reduce_spark.inventory._util import register_views

    register_views(spark, SF_DIR, ["lineitem"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    return spark, con


def test_differential_fuzz_30_queries(engines):
    spark, con = engines
    rng = random.Random(20260813)
    mismatches = []
    for i in range(30):
        q = _gen_query(rng)
        sdf = spark.sql(q)
        cols = sdf.columns
        s_rows = [r.asDict() for r in sdf.collect()]
        d = con.execute(q).df()
        d_rows = d.to_dict("records")
        if _rowset(s_rows, cols) != _rowset(d_rows, cols):
            mismatches.append((i, q))
    assert not mismatches, f"{len(mismatches)} differential mismatches: {mismatches[:3]}"
