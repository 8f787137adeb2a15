"""Local differential harness mirroring the driver's t2 check.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given sf dir, then compares row count, column names,
and an order-insensitive value hash (floats rounded to 9 significant
decimals before hashing to absorb engine fp noise — the driver does
its own normalization; this is our pre-flight).

Usage: python tools/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"  # duckdb->pandas NULL doubles arrive as NaN
        return f"n:{v:.9g}"
    if isinstance(v, int) and abs(v) < (1 << 53):
        # unify with float repr: pandas promotes nullable-int cols to
        # float64, so 394 and 394.0 must hash identically
        return f"n:{format(v, '.9g')}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return f"{type(v).__name__[:1]}:{v}"


def table_hash(rows, columns):
    row_strs = sorted(
        "|".join(norm_value(row[c]) for c in sorted(columns)) for row in rows
    )
    h = hashlib.sha256()
    for s in row_strs:
        h.update(s.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    filters = args[1:]

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    if vanilla:
        # mirror the driver exactly: default configs, no engine session
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from quack_reduce_spark.session import get_spark

        spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(spark_rows)} rows  [{took:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        duck_cols = list(ddf.columns)
        duck_rows = ddf.to_dict("records")
        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            hs = table_hash(spark_rows, spark_cols)
            hd = table_hash(
                [{k: _py(v) for k, v in row.items()} for row in duck_rows], duck_cols
            )
            if hs != hd:
                problems.append(f"hash spark={hs} duck={hd}")
                _show_diff(spark_rows, duck_rows, spark_cols)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok {name}: {len(spark_rows)} rows  [{took:.1f}s]")
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


def _py(v):
    """numpy/pandas scalar → python native for hashing parity."""
    import numpy as np
    import pandas as pd

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.ndarray):
        return [_py(x) for x in v]
    if v is pd.NaT:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None if False else v
    return v


def _show_diff(spark_rows, duck_rows, cols, limit=4):
    key = lambda r: "|".join(norm_value(r[c]) for c in sorted(cols))  # noqa: E731
    smap = {key(r): r for r in spark_rows}
    dmap = {key({k: _py(v) for k, v in r.items()}): r for r in duck_rows}
    only_s = [smap[k] for k in smap.keys() - dmap.keys()][:limit]
    only_d = [dmap[k] for k in dmap.keys() - smap.keys()][:limit]
    for r in only_s:
        print("   spark-only:", r)
    for r in only_d:
        print("   duck-only :", r)


if __name__ == "__main__":
    raise SystemExit(main())
