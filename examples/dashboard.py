"""Interactive-dashboard example — the reference's Streamlit BI app
(`/root/reference/src/dashboard/dashboard.py:24-71`) recast as a
terminal renderer over the same engine.

Reference flow: the dashboard queries a dbt-materialized artifact live
through the serverless engine — one COUNT(*) (dashboard.py:37-39),
one top-k projection with a user-chosen k (dashboard.py:42-52), a
seaborn bar chart + query metadata (timing, warm flag)
(dashboard.py:55-71). Same queries here, ASCII bars instead of
seaborn, and the engine's metadata envelope displayed the same way.

Run:  python examples/dashboard.py [sf_dir] [top_k]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from quack_reduce_spark.engine import Engine

BAR_WIDTH = 40


def bar_chart(rows: list[dict], label_col: str, value_col: str) -> str:
    if not rows:
        return "(no data)"
    peak = max(r[value_col] for r in rows)
    lines = []
    for r in rows:
        n = int(BAR_WIDTH * r[value_col] / peak) if peak else 0
        lines.append(f"{str(r[label_col]):>12} | {'#' * n} {r[value_col]}")
    return "\n".join(lines)


def run(sf_dir: str, top_k: int) -> None:
    eng = Engine()
    eng.register("lineitem", f"{sf_dir}/lineitem.parquet")

    # batch half: materialize the artifact the dashboard reads
    # (the dbt model pair — see examples/pipeline.py for the full flow)
    artifact = tempfile.mkdtemp(prefix="dash_") + "/my_view.parquet"
    view = eng.df(
        "SELECT l_suppkey AS location_id, COUNT(*) AS counts "
        "FROM lineitem GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 200"
    )
    eng.materialize(view, artifact)
    eng.register("my_view", artifact)

    # the dashboard's widget refresh fires its queries as ONE concurrent
    # burst on FAIR pools (Engine.sql_many) — the engine analog of the
    # reference's parallel Lambda fan-out (benchmark.py:207-211)
    total, top, by_tail = eng.sql_many(
        [
            "SELECT COUNT(*) AS counts FROM my_view",
            "SELECT location_id, counts FROM my_view "
            "ORDER BY counts DESC, location_id ASC "
            f"LIMIT {top_k}",
            "SELECT location_id, counts FROM my_view "
            "ORDER BY counts ASC, location_id ASC LIMIT 5",
        ],
        limit=None,
    )
    print(f"rows in view: {total.records[0]['counts']}")
    print(f"  [{total.metadata['timeMs']} ms, warm={total.metadata['warm']}]")

    print(f"\ntop {top_k} locations by trips:")
    print(bar_chart(top.records, "location_id", "counts"))
    print(f"  [{top.metadata['timeMs']} ms, warm={top.metadata['warm']}]")

    print("\nquietest 5 locations:")
    print(bar_chart(by_tail.records, "location_id", "counts"))


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    run(sf, k)
