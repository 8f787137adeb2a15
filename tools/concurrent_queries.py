"""Concurrent multi-query fan-out demo — the reference's benchmark
fires 20 parallel Lambda invocations of the same query family
(``/root/reference/src/benchmark.py:207-211``); the Spark analog is N
client threads driving ``Engine.sql_many`` over one shared session
with FAIR scheduler pools (session.py).

Runs a mixed query burst serially then concurrently, asserts the
results are IDENTICAL, and prints one JSON line with both wall times.
Concurrency must never change answers — only scheduling.

Usage: python tools/concurrent_queries.py [sf_dir] [n_threads]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from quack_reduce_spark.engine import Engine

QUERY_TEMPLATES = [
    # the reference benchmark's shape: grouped counts with a moving filter
    "SELECT l_suppkey, COUNT(*) AS counts FROM lineitem "
    "WHERE l_quantity > {q} GROUP BY l_suppkey ORDER BY counts DESC, l_suppkey LIMIT 10",
    # star join
    "SELECT n_name, COUNT(*) AS n FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey WHERE o.o_totalprice > {p} "
    "GROUP BY n_name ORDER BY n DESC, n_name LIMIT 5",
    # window — o_custkey tie-break makes ROW_NUMBER deterministic: ties
    # on o_totalprice within a priority partition would otherwise get
    # arbitrary rank order and the rk <= k row set could differ between
    # a serial and a concurrent run without any real concurrency bug
    "SELECT * FROM (SELECT o_custkey, o_totalprice, o_orderpriority, "
    "ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_custkey) AS rk "
    "FROM orders) WHERE rk <= {k} ORDER BY o_orderpriority, rk, o_custkey LIMIT 20",
]


def build_burst(n: int) -> list[str]:
    out = []
    for i in range(n):
        t = QUERY_TEMPLATES[i % len(QUERY_TEMPLATES)]
        out.append(t.format(q=10 + (i % 5) * 8, p=100_000 + i * 10_000, k=2 + i % 3))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    eng = Engine()
    eng.register_dir(sf_dir, ["lineitem", "orders", "customer", "nation"])
    burst = build_burst(n_threads * 2)

    t0 = time.time()
    serial = [eng.sql(q) for q in burst]
    t_serial = time.time() - t0

    t0 = time.time()
    concurrent = eng.sql_many(burst, max_threads=n_threads)
    t_concurrent = time.time() - t0

    mismatches = sum(
        1 for s, c in zip(serial, concurrent) if s.records != c.records
    )
    print(json.dumps({
        "metric": "concurrent_fanout",
        "n_queries": len(burst),
        "n_threads": n_threads,
        "serial_sec": round(t_serial, 3),
        "concurrent_sec": round(t_concurrent, 3),
        "speedup": round(t_serial / max(t_concurrent, 1e-9), 2),
        "result_mismatches": mismatches,
        "sf": sf_dir,
    }))
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
