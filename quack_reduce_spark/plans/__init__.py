"""Plan-shape inspection helpers (SURVEY §4: verify, don't build).

The reference's optimizations (manual pruning, manual map-reduce) are
Catalyst built-ins here; these helpers let tests assert the built-ins
actually fired — pruned partitions, pushed filters, broadcast joins,
partial/final aggregation, top-k physical op — so the 100 TB design
claims are checked, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what .explain('formatted') prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Executed (post-AQE-prep) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet PushedFilters entry mentions ``fragment``."""
    plan = formatted_plan(df)
    return any("PushedFilters" in line and fragment in line for line in plan.splitlines())


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (column pruning check)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("ReadSchema:", 1)[1]
            return [
                part.split(":")[0].strip()
                for part in schema.strip().lstrip("struct<").rstrip(">").split(",")
            ]
    return []


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_partial_final_agg(df: DataFrame) -> bool:
    """Partial/final HashAggregate split — the reference's manual
    map-reduce (benchmark.py:185-240) as Spark's default plan."""
    plan = executed_plan(df)
    return plan.count("HashAggregate") >= 2 or "partial_" in plan


def has_top_k(df: DataFrame) -> bool:
    """Sort+limit fused into TakeOrderedAndProject (no full sort)."""
    return "TakeOrderedAndProject" in executed_plan(df)


def scanned_partition_count(df: DataFrame) -> tuple[int, int]:
    """(selected, total) partition counts from a pruned parquet scan."""
    plan = formatted_plan(df)
    import re

    m = re.search(r"(\d+) parts selected.*?(\d+)", plan)
    if m:
        return int(m.group(1)), int(m.group(2))
    return (-1, -1)
