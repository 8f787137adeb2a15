"""Stats-planned lakehouse tour — the round-9..11 planning stack in one
script: clustered write -> automatic SQL file skipping (range / IN /
OR / LIKE / IS NULL) -> ANALYZE from metadata -> estimate-driven join
planning -> layout degradation by random appends -> OPTIMIZE restoring
pruning. Every step prints the engine's own telemetry, so the output
IS the evidence.

The reference re-lists and re-reads full objects per query
(``quack.py:145``) and defers table formats (``README.md:190``); this
is the read-planning half of a table format on plain parquet.

Run:  python examples/stats_planning.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from quack_reduce_spark.engine import Engine  # noqa: E402
from quack_reduce_spark.inventory._util import load  # noqa: E402
from quack_reduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("stats-planning-example")
    eng = Engine(spark=spark)
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")

    with tempfile.TemporaryDirectory(prefix="qrs_statsplan_") as tmp:
        table = f"{tmp}/orders"

        # 1. one call -> prunable table (range-clustered + manifest)
        n_files = eng.write_clustered(orders, table, ["o_orderdate"], n_files=12)
        eng.register("orders_c", table)
        print(f"[1] write_clustered: {n_files} files, manifest built")

        # 2. plain SQL range query: the engine plans from the manifest
        res = eng.sql(
            "SELECT o_orderstatus, COUNT(*) AS n FROM orders_c "
            "WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1",
            limit=5,
        )
        print(f"[2] range query zonemap telemetry: {res.metadata.get('zonemap')}")

        # 3. IN / OR / LIKE / IS NULL all prune too
        eng.df(
            "SELECT COUNT(*) AS n FROM orders_c WHERE o_orderdate IN "
            "(TIMESTAMP '1995-06-17 00:00:00', TIMESTAMP '1997-02-03 00:00:00')"
        ).collect()
        print(f"[3] IN-list telemetry: {eng.last_zonemap_report.get('orders_c')}")

        # 4. ANALYZE from metadata — zero data scanned, exact numbers
        st = eng.table_stats("orders_c")
        d = st["columns"]["o_orderdate"]
        print(
            f"[4] table_stats: rows={st['n_rows']} files={st['n_files']} "
            f"dates=[{d['min']} .. {d['max']}] nulls={d['nulls']}"
        )

        # 5. estimate-driven join planning: the filtered dim broadcasts
        dim = cust.filter("c_acctbal > 9000").withColumnRenamed(
            "c_custkey", "o_custkey"
        )
        eng.plan_join(eng.spark.table("orders_c"), dim, "o_custkey")
        print(f"[5] plan_join strategy: {eng.last_join_plan['strategy']}")

        # 6. random appends degrade the layout: no skipping possible
        orders.limit(500).repartition(3).write.mode("append").parquet(table)
        from quack_reduce_spark.operators.zonemaps import append_zonemap

        append_zonemap(spark, table, ["o_orderdate"])
        eng.register("orders_c", table)
        eng.df(
            "SELECT COUNT(*) AS n FROM orders_c "
            "WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-02-01'"
        ).collect()
        print(f"[6] after random appends: {eng.last_zonemap_report.get('orders_c')}")

        # 7. OPTIMIZE: crash-safe re-cluster + manifest rebuild
        stats = eng.optimize(table, ["o_orderdate"], target_rows_per_file=200)
        eng.register("orders_c", table)
        eng.df(
            "SELECT COUNT(*) AS n FROM orders_c "
            "WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-02-01'"
        ).collect()
        print(
            f"[7] optimize {stats['files_before']}->{stats['files_after']} files; "
            f"pruning restored: {eng.last_zonemap_report.get('orders_c')}"
        )


if __name__ == "__main__":
    main()
