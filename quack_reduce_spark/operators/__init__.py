"""Custom composite operators (library-level, not planner-level).

Operators the reference's SQL dialect offers (or the north star
requires) that Spark lacks as a single primitive, each built as a
composition of DataFrame ops — see SURVEY.md §7 "Built-in vs custom".
"""

from quack_reduce_spark.operators.asof import asof_join

__all__ = ["asof_join"]
