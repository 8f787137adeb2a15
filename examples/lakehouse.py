"""Lakehouse lifecycle demo — versioned tables end to end.

Everything the round-5 lake layer adds, on one table:

  1. create a versioned table (pointer-commit protocol, lake.py)
  2. MERGE upsert a correction batch           -> v2
  3. copy-on-write DELETE (GDPR-style)         -> v3
  4. time-travel reads of every snapshot + commit history
  5. CDC change feed v1->v3 with old/new payloads
  6. incremental MV refresh from the feed (never rescans v3)
  7. O(1) rollback, then vacuum old versions

The reference repo has no transactional layer (plain parquet
re-uploads, run_me_first.py:83-100; table formats are its declared
future work, README.md:190) — this demo is that future work, done
Spark-first on plain parquet.

Run:  python examples/lakehouse.py [sf_dir] [table_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from quack_reduce_spark.engine import Engine


def run(sf_dir: str, table: str) -> None:
    eng = Engine()
    eng.register("orders", f"{sf_dir}/orders.parquet")
    orders = eng.spark.table("orders")

    # 1. create
    v1 = orders.filter(F.col("o_orderkey") % 7 == 0)
    eng.write_versioned(v1, table, op="create")

    # 2. merge a correction batch (double the price of every 21st key)
    updates = orders.filter(F.col("o_orderkey") % 21 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    stats = eng.merge_upsert(table, updates, key="o_orderkey")
    print(f"merge:  {stats}")

    # 3. delete
    print(f"delete: {eng.delete_where(table, 'o_orderkey % 14 = 0')}")

    # 4. time travel + history
    for h in eng.history(table):
        live = " <- live" if h["is_current"] else ""
        print(f"history: {h['version']} op={h['op']:13s} rows={h['rows']}{live}")
    for v in (1, 2, 3):
        n = eng.read_table(table, v).count()
        print(f"snapshot v{v}: {n} rows")

    # 5. CDC feed with payloads
    feed = eng.table_changes(table, 1, 3, key="o_orderkey", payload=["o_totalprice"])
    print("changes v1->v3 by type:")
    feed.groupBy("change_type").count().orderBy("change_type").show()

    # 6. incremental MV: advance the v1 aggregate using only the feed
    mv1 = eng.read_table(table, 1).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    )
    ch = eng.table_changes(
        table, 1, 3, key="o_orderkey", payload=["o_orderstatus", "o_totalprice"]
    )
    minus = ch.filter(F.col("change_type").isin("delete", "update")).select(
        F.col("old_o_orderstatus").alias("o_orderstatus"),
        F.lit(-1).alias("dn"), (-F.col("old_o_totalprice")).alias("ds"),
    )
    plus = ch.filter(F.col("change_type").isin("insert", "update")).select(
        F.col("new_o_orderstatus").alias("o_orderstatus"),
        F.lit(1).alias("dn"), F.col("new_o_totalprice").alias("ds"),
    )
    deltas = minus.unionByName(plus).groupBy("o_orderstatus").agg(
        F.sum("dn").alias("dn"), F.sum("ds").alias("ds")
    )
    refreshed = (
        mv1.join(deltas, "o_orderstatus", "full_outer")
        .select(
            "o_orderstatus",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        )
        .filter(F.col("n") > 0)
        .orderBy("o_orderstatus")
    )
    print("MV refreshed from the feed (counts per status):")
    refreshed.show()
    recompute = {
        r["o_orderstatus"]: r["n"]
        for r in eng.read_table(table).groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["o_orderstatus"]: r["n"] for r in refreshed.collect()} == recompute
    print("incremental MV == full recompute: OK")

    # 7. rollback + vacuum
    eng.rollback(table, 1)
    print(f"after rollback to v1: {eng.read_table(table).count()} rows live")
    from quack_reduce_spark import lake

    print(f"vacuum removed: {lake.vacuum(table, keep=1)}")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    tbl = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp() + "/orders_lh"
    run(sf, tbl)
