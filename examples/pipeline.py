"""Batch -> interactive pipeline — the reference's dbt + dashboard flow
(SURVEY §3 entry point 3) as engine calls.

Reference shape:
  1. model `trips_by_pickup_location` (view): scan + group + count
     (/root/reference/src/dashboard/dbt/models/taxi/trips_by_pickup_location.sql)
  2. model `top_pickup_locations` (external): ref(1) + ORDER BY 2 DESC
     LIMIT 200, materialized to s3://.../my_view.parquet
     (top_pickup_locations.sql:1-9)
  3. dashboard issues live COUNT(*) + top-k queries against the
     artifact (dashboard.py:37-52)

Here: lineitem plays the taxi table, l_suppkey the pickup location.
Run:  python examples/pipeline.py [sf_dir] [artifact_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from quack_reduce_spark.engine import Engine


def run(sf_dir: str, artifact_dir: str) -> None:
    eng = Engine()
    eng.register("lineitem", f"{sf_dir}/lineitem.parquet")

    # model 1 — view (dbt materialized='view')
    eng.create_view(
        "trips_by_suppkey",
        """
        SELECT l_suppkey AS location_id, COUNT(*) AS counts
        FROM lineitem
        GROUP BY 1
        """,
    )

    # model 2 — external materialization (single parquet artifact)
    top = eng.df(
        "SELECT location_id, counts FROM trips_by_suppkey ORDER BY 2 DESC, 1 ASC LIMIT 200"
    )
    artifact = f"{artifact_dir}/my_view.parquet"
    eng.materialize(top, artifact)
    print(f"materialized artifact: {artifact}")

    # dashboard — live queries against the artifact (same engine)
    eng.register("my_view", artifact)
    total = eng.sql("SELECT COUNT(*) AS counts FROM my_view")
    print("artifact rows:", total.records[0]["counts"])
    top_k = eng.sql(
        "SELECT location_id, counts FROM my_view ORDER BY counts DESC, location_id ASC",
        limit=5,
    )
    for rec in top_k.records:
        print(f"  location {rec['location_id']}: {rec['counts']} items")
    print(f"(warm={top_k.metadata['warm']}, {top_k.metadata['timeMs']:.0f} ms)")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="qrs_pipeline_")
    run(sf, out)
