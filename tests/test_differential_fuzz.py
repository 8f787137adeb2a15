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
import os
import random

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

# soak multiplier: SPARK_GRAFT_FUZZ_SOAK=10 runs 10x the default
# iteration counts (a 680-query soak at 10x passed clean in r2)
_SOAK = int(os.environ.get("SPARK_GRAFT_FUZZ_SOAK", "1"))

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


def _gen_join_query(rng: random.Random) -> str:
    """Two-table join tier: lineitem x orders with mixed predicates and
    grouped aggregates over columns from both sides."""
    how = rng.choice(["JOIN", "LEFT JOIN"])
    preds = []
    if rng.random() < 0.8:
        preds.append(f"o_totalprice > {rng.randint(1000, 300000)}")
    if rng.random() < 0.6:
        st = rng.sample(["O", "F", "P"], rng.randint(1, 2))
        preds.append("o_orderstatus IN (" + ", ".join(f"'{s}'" for s in st) + ")")
    if rng.random() < 0.5:
        preds.append(f"l_quantity <= {rng.randint(5, 45)}")
    where = ("WHERE " + " AND ".join(preds)) if preds else ""
    group = rng.choice(["o_orderstatus", "l_returnflag", "o_orderpriority"])
    aggs = ["COUNT(*) AS n", "CAST(SUM(l_orderkey) AS BIGINT) AS sum_key"]
    if rng.random() < 0.5:
        aggs.append("MAX(o_totalprice) AS max_price")
    return (
        f"SELECT {group}, {', '.join(aggs)} FROM lineitem "
        f"{how} orders ON l_orderkey = o_orderkey {where} GROUP BY {group}"
    )


def _gen_window_query(rng: random.Random) -> str:
    """Window tier: rank over a deterministic (unique-key-tiebroken)
    order, filtered to a top-n — identical ANSI in both engines."""
    n = rng.randint(2, 5)
    part = rng.choice(["o_orderstatus", "o_orderpriority"])
    return (
        "SELECT * FROM ("
        f"SELECT {part}, o_orderkey, "
        f"ROW_NUMBER() OVER (PARTITION BY {part} "
        "ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk "
        f"FROM orders) WHERE rk <= {n}"
    )


@pytest.fixture(scope="module")
def engines(spark):
    from quack_reduce_spark.inventory._util import register_views

    register_views(spark, SF_DIR, ["lineitem", "orders"])
    con = duckdb.connect()
    for t in ["lineitem", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return spark, con


def _run_differential(engines, gen, n, seed):
    n *= _SOAK
    spark, con = engines
    rng = random.Random(seed)
    mismatches = []
    for i in range(n):
        q = gen(rng)
        sdf = spark.sql(q)
        cols = sdf.columns
        s_rows = [r.asDict() for r in sdf.collect()]
        d_rows = con.execute(q).df().to_dict("records")
        if _rowset(s_rows, cols) != _rowset(d_rows, cols):
            mismatches.append((i, q))
    assert not mismatches, f"{len(mismatches)} differential mismatches: {mismatches[:3]}"


def test_differential_fuzz_single_table(engines):
    _run_differential(engines, _gen_query, 30, 20260813)


def test_differential_fuzz_joins(engines):
    _run_differential(engines, _gen_join_query, 20, 987654)


def test_differential_fuzz_windows(engines):
    _run_differential(engines, _gen_window_query, 10, 424242)


def _gen_setop_query(rng: random.Random) -> str:
    """Set-operation tier: UNION/INTERSECT/EXCEPT (+ALL variants) of two
    filtered projections of the same table — NULL-free columns so bag
    semantics agree exactly."""
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL"]
    )
    cols = "l_returnflag, l_linestatus, l_linenumber"
    a = rng.randint(1000, 4000)
    b = rng.randint(1000, 4000)
    return (
        f"SELECT {cols} FROM lineitem WHERE l_orderkey < {a} "
        f"{op} "
        f"SELECT {cols} FROM lineitem WHERE l_orderkey < {b}"
    )


def test_differential_fuzz_setops(engines):
    _run_differential(engines, _gen_setop_query, 12, 13579)


def _gen_extreme_agg_query(rng: random.Random) -> str:
    """Extreme-value aggregate tier: max_by/min_by (no totalprice ties
    in the fixtures, so argmax is deterministic), quantifiers, count_if,
    interpolated median — identical function names in both dialects."""
    group = rng.choice(["o_orderstatus", "o_orderpriority"])
    thresh = rng.randint(10_000, 400_000)
    aggs = [
        "COUNT(*) AS n",
        "max_by(o_orderkey, o_totalprice) AS top_order",
        "min_by(o_orderkey, o_totalprice) AS bottom_order",
        f"bool_and(o_totalprice > {thresh}) AS all_above",
        f"bool_or(o_totalprice > {thresh}) AS any_above",
        f"CAST(count_if(o_custkey % {rng.randint(2, 7)} = 0) AS BIGINT) AS n_mod",
    ]
    if rng.random() < 0.6:
        aggs.append("median(o_totalprice) AS med")
    return (
        f"SELECT {group}, {', '.join(aggs)} FROM orders "
        f"WHERE o_totalprice > {rng.randint(1000, 300000)} GROUP BY {group}"
    )


def test_differential_fuzz_extreme_aggs(engines):
    _run_differential(engines, _gen_extreme_agg_query, 15, 11223344)


def _gen_scalar_fn_query(rng: random.Random) -> str:
    """Scalar-function tier: string/date expressions from the exact
    ANSI intersection (upper/lower/trim/substr/replace/length,
    date_trunc/EXTRACT) — grouped so result sets stay small."""
    str_col = rng.choice(["o_orderstatus", "o_orderpriority"])
    exprs = [f"COUNT(*) AS n"]
    pick = rng.sample(
        [
            f"MIN(upper({str_col})) AS min_upper",
            f"MAX(lower({str_col})) AS max_lower",
            f"MIN(substr({str_col}, 1, {rng.randint(1, 3)})) AS min_sub",
            f"MAX(replace({str_col}, '-', '_')) AS max_repl",
            f"CAST(MAX(length({str_col})) AS INT) AS max_len",
            f"MIN(trim({str_col})) AS min_trim",
        ],
        rng.randint(2, 4),
    )
    exprs += pick
    grp = rng.choice(
        [
            "CAST(EXTRACT(year FROM o_orderdate) AS INT)",
            "CAST(EXTRACT(month FROM o_orderdate) AS INT)",
            "date_trunc('month', o_orderdate)",
        ]
    )
    return (
        f"SELECT {grp} AS g, {', '.join(exprs)} FROM orders "
        f"WHERE o_orderkey < {rng.randint(2000, 12000)} GROUP BY g"
    )


def test_differential_fuzz_scalar_fns(engines):
    _run_differential(engines, _gen_scalar_fn_query, 20, 55667788)
