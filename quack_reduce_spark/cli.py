"""CLI client — parity with the reference's ``quack.py`` runner.

The reference CLI (``/root/reference/src/quack.py:127-176``) takes a
SQL string (-q), a row limit (-limit), invokes the engine, and renders
the rows plus timing metadata. This is the same surface over the
in-process Spark engine:

    python -m quack_reduce_spark.cli --data /root/testdata/sf0.001 \
        -q "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1"

With no -q, runs the canary COUNT(*) the reference substitutes
(``quack.py:141-148``).
"""

from __future__ import annotations

import argparse
import sys

FIXTURE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

CANARY = "SELECT COUNT(*) AS counts FROM lineitem"  # quack.py:146 analog
DISPLAY_ROWS = 10  # client-side display cap, quack.py:26,118


def render(records: list[dict], max_rows: int = DISPLAY_ROWS) -> str:
    if not records:
        return "(empty result)"
    cols = list(records[0].keys())
    shown = records[:max_rows]
    widths = {
        c: max(len(c), *(len(str(r.get(c))) for r in shown)) for c in cols
    }
    lines = [
        " | ".join(c.ljust(widths[c]) for c in cols),
        "-+-".join("-" * widths[c] for c in cols),
    ]
    lines += [" | ".join(str(r.get(c)).ljust(widths[c]) for c in cols) for r in shown]
    if len(records) > max_rows:
        lines.append(f"... ({len(records) - max_rows} more rows)")
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="quack-reduce-spark SQL runner")
    ap.add_argument("-q", "--query", default=None, help="SQL to run (default: canary count)")
    ap.add_argument("-limit", "--limit", type=int, default=20, help="server-side row cap")
    ap.add_argument("--data", default="/root/testdata/sf0.001", help="lake dir with <table>.parquet files")
    ap.add_argument(
        "--catalog",
        default=None,
        help="attach tables from a _catalog.json manifest dir "
        "(Engine.save_catalog output) instead of the fixture layout",
    )
    args = ap.parse_args(argv)

    from quack_reduce_spark.engine import Engine

    eng = Engine()
    if args.catalog:
        eng.load_catalog(args.catalog)
    else:
        eng.register_dir(args.data, FIXTURE_TABLES)

    res = eng.sql(args.query or CANARY, limit=args.limit)
    print(render(res.records))
    meta = res.metadata
    print(
        f"\n[{meta['eventId'][:8]}] {len(res.records)} rows in "
        f"{meta['timeMs']:.0f} ms (warm={meta['warm']})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
