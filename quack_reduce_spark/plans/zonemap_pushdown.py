"""Zone-map pushdown for the SQL surface: physical-plan constraint
extraction + manifest-planned view rebinding.

The round-9 zone-map layer (operators/zonemaps.py) prunes files when a
caller invokes ``scan_pruned()`` explicitly. This module makes the
ENGINE do it: ``Engine.sql``/``Engine.df`` detect range predicates on
a zone-mapped table's stats columns in the query's own PHYSICAL plan
and re-plan the scan from the manifest — the user writes plain SQL
(the reference's whole UX, ``app.py:51``) and gets Iceberg/Delta-style
stats skipping on plain parquet for free.

How constraints are found — asked of Catalyst, not parsed from SQL:
``spark.sql(query)`` is planned (analysis + optimization only, no
execution) and every ``FileSourceScanExec`` leaf is inspected via the
JVM bridge. A scan's ``dataFilters`` are the optimizer's OWN conjuncts
(post constant-folding, post pushdown-splitting), so everything the
rewriter produces from BETWEEN / IN-rewrites / CTE inlining arrives
here already normalized. Conjuncts of the shape ``<attr> <cmp>
<literal>`` over a manifest stats column become closed-interval bounds
(strict bounds widen to closed — pruning needs only a SUPERSET of the
matching files to stay sound, because the query re-applies its full
predicate when it executes).

Soundness rules (pruning can cost reads, never correctness):
- per SCAN, bounds on different columns INTERSECT (all must hold);
- per TABLE, the surviving file sets of different scans UNION (a
  self-join's two scans each need their own files);
- a scan of the table with NO usable bound disables pruning for the
  whole table (it needs every file);
- unrecognized expression shapes / uncomparable literal types are
  simply ignored (no bound extracted -> no pruning from them).

The reference has no planner at all — every query re-lists and
re-reads full objects (``quack.py:145``); this is the read-planning
half of a table format, driven from the engine's own plan.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1)

# comparison node -> (bound-kind when attr is on the LEFT)
_CMP_LEFT = {
    "GreaterThanOrEqual": "lo",
    "GreaterThan": "lo",  # strict widens to closed: superset, sound
    "LessThanOrEqual": "hi",
    "LessThan": "hi",
    "EqualTo": "eq",
}
_FLIP = {"lo": "hi", "hi": "lo", "eq": "eq"}


def _bare(p: str) -> str:
    return "/" + p.split("://")[-1].removeprefix("file:").lstrip("/")


def _literal_py(lit: Any) -> tuple[Any, bool]:
    """Python value of a Catalyst Literal, (value, usable). Dates and
    timestamps arrive in Catalyst internal form (days / micros since
    epoch); strings as UTF8String JVM objects. Types we can't compare
    portably against manifest values (decimal, binary, interval...)
    report unusable."""
    type_name = lit.dataType().typeName()
    v = lit.value()
    if v is None:
        return None, False
    if type_name == "date":
        return _EPOCH_DATE + _dt.timedelta(days=int(v)), True
    if type_name in ("timestamp", "timestamp_ntz"):
        # machine-local == UTC in this engine's deployments; manifest
        # values are naive datetimes read back from parquet the same way
        return _EPOCH_TS + _dt.timedelta(microseconds=int(v)), True
    if type_name == "string":
        return v if isinstance(v, str) else v.toString(), True
    if type_name in ("integer", "long", "short", "byte", "double", "float"):
        return v, True
    return None, False


def _side(e: Any) -> tuple[str | None, Any]:
    n = e.getClass().getSimpleName()
    if n == "AttributeReference":
        return "attr", e.name()
    if n == "Literal":
        return "lit", e
    return None, None


def _conjunct_bound(e: Any) -> tuple[str, str, Any] | None:
    """(column, 'lo'|'hi'|'eq', value) from one dataFilters conjunct,
    or None when the shape isn't ``attr cmp literal``."""
    kind = _CMP_LEFT.get(e.getClass().getSimpleName())
    if kind is None:
        return None
    lk, lv = _side(e.left())
    rk, rv = _side(e.right())
    if lk == "attr" and rk == "lit":
        col, lit, flip = lv, rv, False
    elif lk == "lit" and rk == "attr":
        col, lit, flip = rv, lv, True
    else:
        return None
    val, ok = _literal_py(lit)
    if not ok:
        return None
    return col, (_FLIP[kind] if flip else kind), val


def scan_constraints(
    df: DataFrame, paths_by_name: dict[str, str]
) -> dict[str, list[dict[str, tuple[Any, Any]]]]:
    """Per registered table: one ``{col: (lo, hi)}`` dict PER SCAN of
    that table in ``df``'s physical plan (lo/hi may each be None for
    one-sided ranges; a scan with no usable bounds contributes an
    EMPTY dict — the caller must treat that as 'needs all files').

    ``paths_by_name``: view name -> resolved data dir; scans are
    matched to tables by file-index root path."""
    name_by_root = {_bare(p): n for n, p in paths_by_name.items()}
    out: dict[str, list[dict[str, tuple[Any, Any]]]] = {}
    plan = df._jdf.queryExecution().sparkPlan()  # plans, never executes
    leaves = plan.collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if leaf.getClass().getSimpleName() != "FileSourceScanExec":
            continue
        roots = leaf.relation().location().rootPaths()
        names = {
            name_by_root.get(_bare(roots.apply(j).toString()))
            for j in range(roots.size())
        }
        names.discard(None)
        if len(names) != 1:
            continue  # not one of ours / mixed-root scan: leave alone
        name = names.pop()
        bounds: dict[str, tuple[Any, Any]] = {}
        filters = leaf.dataFilters()
        for j in range(filters.size()):
            got = _conjunct_bound(filters.apply(j))
            if got is None:
                continue
            col, kind, val = got
            lo, hi = bounds.get(col, (None, None))
            if kind in ("lo", "eq") and (lo is None or val > lo):
                lo = val
            if kind in ("hi", "eq") and (hi is None or val < hi):
                hi = val
            bounds[col] = (lo, hi)
        out.setdefault(name, []).append(bounds)
    return out


def plan_pruned_files(
    spark,
    data_dir: str,
    stats_cols: list[str],
    scans: list[dict[str, tuple[Any, Any]]],
) -> tuple[list[str], int] | None:
    """Resolve per-scan bounds into ONE surviving file list for the
    table, or None when pruning can't apply (some scan is unbounded on
    every stats column, or nothing would be skipped). Within a scan,
    per-column survivor sets intersect; across scans they union."""
    from quack_reduce_spark.operators.zonemaps import prune_files

    union: set[str] = set()
    total = None
    for bounds in scans:
        scan_files: set[str] | None = None
        for col in stats_cols:
            lo, hi = bounds.get(col, (None, None))
            if lo is None and hi is None:
                continue
            files, total = prune_files(spark, data_dir, col, lo, hi)
            fs = set(files)
            scan_files = fs if scan_files is None else (scan_files & fs)
        if scan_files is None:
            return None  # this scan needs every file
        union |= scan_files
    if total is None or len(union) >= total:
        return None
    return sorted(union), total
