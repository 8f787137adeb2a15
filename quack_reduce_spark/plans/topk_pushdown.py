"""Top-k FILE pushdown from manifest stats: answer ``ORDER BY col
DESC/ASC LIMIT k`` by visiting only the files that can contribute.

This is the SCAN-shaped sibling of the reference's flagship artifact:
``top_pickup_locations.sql:8-9`` ends in ``ORDER BY 2 DESC LIMIT
200`` over a GROUP BY — that grouped form is already answered from
metadata by the aggregate pushdown (``plans/agg_pushdown.py`` peels
the Sort/Limit above the Aggregate) — while THIS module covers the
raw-column ``ORDER BY col LIMIT k`` scan, which a plain engine runs
as a FULL SCAN + TakeOrderedAndProject.
On a table CLUSTERED by the sort column the manifest already knows
each file's [min, max]: the classic Iceberg/Delta sort-order-scan
observation is that once k qualifying rows provably sort at-or-above
some bound T, every file whose whole range sorts strictly below T can
be skipped. This module derives that bound STATICALLY from the
per-file stats and narrows the engine's view rebind to the surviving
files; the original query (its WHERE, full ORDER BY with tiebreaks,
and LIMIT) still executes over them, so results are row-identical by
construction.

Soundness argument (DESC, Spark's default NULLS LAST):

- only files whose conjunct classification is 'all' (every row passes
  the WHERE — the agg-pushdown ``_classify_row`` exactness machinery)
  count toward the bound: visiting files in min_c-descending order,
  the first prefix whose qualifying non-null rows total >= k proves k
  result candidates all have ``c >= T`` where T is the prefix's last
  min_c;
- a file with ``max_c < T`` (or all-NULL on c) holds only rows that
  lose to ALL k of those candidates under ``c DESC`` — strictly, so
  secondary sort keys and LIMIT tie-breaking cannot resurrect them;
- a counted file can never be excluded (its max_c >= min_c >= T), so
  the bound never removes its own evidence.

ASC mirrors with Spark's default NULLS FIRST: sure-qualifying NULL
rows (from 'all' files) sort ahead of every value row and count toward
k; files are visited in max_c-ascending order; a file is excludable
only when it has ZERO nulls on c and ``min_c > T``.

Everything else declines — non-default null ordering, an OFFSET, an
unparsable first sort key or WHERE conjunct, a stale manifest, NaN
bounds, or a bound that skips nothing (the unclustered case). This is
an accelerator, never a semantics change; at 100 TB it is the
difference between scanning a petabyte-scale table for a 200-row
dashboard answer and reading O(k / rows-per-file) files.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.plans.agg_pushdown import (
    _attr_id,
    _classify_row,
    _exact_conjunct,
    _is_nan,
    _norm_conjuncts,
    _split_and,
    _type_ok,
)
from quack_reduce_spark.plans.zonemap_pushdown import _bare

# a LIMIT above this is not a "top-k" — the threshold machinery still
# works, but the win shrinks and the driver-side sort of file bounds
# should stay trivially cheap
TOPK_MAX_K = 1_000_000


def extract_topk(
    df: DataFrame, paths_by_name: dict[str, str]
) -> dict | None:
    """Inspect ``df``'s optimized logical plan; when it is EXACTLY

        GlobalLimit(k) [LocalLimit] [Project]* Sort(global)
        [Project/Filter]* LogicalRelation(one registered table)

    with a bare-attribute FIRST sort key in the table's schema, the
    default null ordering for its direction, and every Filter conjunct
    exactly understood, return::

        {"table", "col", "tname", "asc", "k",
         "conjuncts": [(col, op, value), ...], "types": {col: tname}}

    None otherwise (the query runs through the generic planner). Only
    the FIRST sort key drives file exclusion — the bound argument is
    strict, so arbitrary tiebreak keys below it stay sound — but it
    must be understood exactly."""
    node = df._jdf.queryExecution().optimizedPlan()
    if node.getClass().getSimpleName() != "GlobalLimit":
        return None
    le = node.limitExpr()
    if le.getClass().getSimpleName() != "Literal" or le.value() is None:
        return None
    k = int(str(le.value()))
    if not (1 <= k <= TOPK_MAX_K):
        return None
    node = node.child()
    if node.getClass().getSimpleName() == "LocalLimit":
        node = node.child()
    # Projects between the limit and the sort are row-wise (1:1): they
    # cannot change WHICH rows the limit keeps, so their shape is free
    while node.getClass().getSimpleName() == "Project":
        node = node.child()
    if node.getClass().getSimpleName() != "Sort":
        return None
    if not getattr(node, "global")():
        return None
    order = node.order()
    if order.size() == 0:
        return None
    so = order.apply(0)
    _n, sid = _attr_id(so.child())
    if sid is None:
        return None  # expression / aliased first key: decline
    asc = so.direction().sql() == "ASC"
    nulls_first = so.nullOrdering().sql() == "NULLS FIRST"
    # only the DEFAULT orderings (what the reference's SQL produces):
    # DESC NULLS LAST / ASC NULLS FIRST — others would need their own
    # bound mirror and never occur in the covered surface
    if asc != nulls_first:
        return None
    node = node.child()
    filter_conds = []
    while True:
        cls = node.getClass().getSimpleName()
        if cls == "Project":
            node = node.child()
        elif cls == "Filter":
            filter_conds.append(node.condition())
            node = node.child()
        elif cls == "LogicalRelation":
            break
        else:
            return None
    try:
        roots = node.relation().location().rootPaths()
    except Exception:
        return None
    name_by_root = {_bare(p): n for n, p in paths_by_name.items()}
    names = {
        name_by_root.get(_bare(roots.apply(j).toString()))
        for j in range(roots.size())
    }
    names.discard(None)
    if len(names) != 1:
        return None
    table = names.pop()
    rel_out = node.output()
    by_id: dict[int, tuple[str, str]] = {}
    for i in range(rel_out.size()):
        a = rel_out.apply(i)
        by_id[int(a.exprId().id())] = (a.name(), a.dataType().typeName())
    if sid not in by_id:
        return None  # sort key is not a bare relation column
    col, tname = by_id[sid]
    if not _type_ok(tname):
        return None
    # every WHERE conjunct must be exactly understood: the bound counts
    # rows that PROVABLY qualify, so nothing may be ignored (unlike
    # plain pruning, which re-applies the predicate anyway)
    conjuncts: list[tuple[str, str, Any]] = []
    for cond in filter_conds:
        for leaf in _split_and(cond):
            got = _exact_conjunct(leaf)
            if got is None:
                return None
            aid, op, v = got
            if aid not in by_id:
                return None
            ccol, ctname = by_id[aid]
            if not _type_ok(ctname):
                return None
            conjuncts.append((ccol, op, v))
    used = {c for c, _o, _v in conjuncts} | {col}
    types = {nm: tn for nm, tn in by_id.values() if nm in used}
    return {
        "table": table,
        "col": col,
        "tname": tname,
        "asc": asc,
        "k": k,
        "conjuncts": conjuncts,
        "types": types,
    }


def plan_topk_files(
    spark: SparkSession,
    path: str,
    stats_cols: list[str],
    info: dict,
) -> tuple[list[str], int, dict, dict] | None:
    """Resolve a :func:`extract_topk` spec into a surviving file list
    via the static k-bound, or None when the pushdown can't fire
    (sort column unstatted, stale manifest, no provable bound, or
    nothing would be skipped). Returns ``(files, total, stats,
    telemetry)`` in the engine's rebind shape."""
    from quack_reduce_spark.operators import zonemaps as _zm
    from quack_reduce_spark.plans import zonemap_pushdown as _zp

    col, k, asc = info["col"], info["k"], info["asc"]
    if col not in stats_cols:
        return None
    # WHERE pruning first (closed-widened, like the agg path): the
    # bound then only has to beat the files a plain range query would
    # already read
    cons: dict[str, tuple] = {}
    for c, op, v in info["conjuncts"]:
        if c not in stats_cols:
            continue  # unstatted conjunct: no pruning, still classified
        if op in ("ge", "gt"):
            nc = (v, None, None, None)
        elif op in ("le", "lt"):
            nc = (None, v, None, None)
        elif op == "eq":
            nc = (None, None, frozenset([v]), None)
        elif op == "in":
            nc = (None, None, v, None)
        elif op == "isnull":
            nc = (None, None, None, "null")
        else:
            nc = (None, None, None, "notnull")
        prev = cons.get(c)
        cons[c] = _zp._and_constraints(prev, nc) if prev else nc
    rows, total = _zm.prune_files_multi(spark, path, cons)
    if total != len(_zm._data_files(path)):
        return None  # un-maintained append: metadata can't be trusted
    norm = _norm_conjuncts(info["conjuncts"])
    surviving: list[tuple[dict, str, int]] = []  # (row, state, n_rows)
    for r in rows:
        n_rows = int(r["n_rows"])
        if n_rows == 0:
            continue
        state = _classify_row(norm, r, n_rows)
        if state == "none":
            continue  # exact semantics prove no row passes: drop it
        surviving.append((r, state, n_rows))

    def bounds(r: dict) -> tuple[Any, Any, int | None]:
        mn, mx = r.get(f"min_{col}"), r.get(f"max_{col}")
        nl = r.get(f"nulls_{col}")
        return mn, mx, (None if nl is None else int(nl))

    # -- the static bound ------------------------------------------------
    # candidates: 'all' files (every row qualifies) with usable stats
    cand = []
    for r, state, n_rows in surviving:
        mn, mx, nl = bounds(r)
        if _is_nan(mn) or _is_nan(mx):
            return None  # NaN sorts above everything: no sound bound
        if state != "all" or nl is None:
            continue
        cand.append((mn, mx, nl, n_rows))
    threshold: Any = None
    have_null_budget = 0
    if not asc:
        # DESC NULLS LAST: visit by min_c descending; T = last prefix
        # min once qualifying non-null rows reach k
        vals = sorted(
            (
                (mn, n_rows - nl)
                for mn, _mx, nl, n_rows in cand
                if mn is not None and n_rows - nl > 0
            ),
            key=lambda t: t[0],
            reverse=True,
        )
        cum = 0
        for mn, nn in vals:
            cum += nn
            if cum >= k:
                threshold = mn
                break
    else:
        # ASC NULLS FIRST: sure-qualifying NULLs sort ahead of every
        # value row and count toward k
        have_null_budget = sum(nl for _mn, _mx, nl, _n in cand)
        if have_null_budget >= k:
            threshold = "__ALL_VALUES_LOSE__"
        else:
            vals = sorted(
                (
                    (mx, n_rows - nl)
                    for _mn, mx, nl, n_rows in cand
                    if mx is not None and n_rows - nl > 0
                ),
                key=lambda t: t[0],
            )
            cum = have_null_budget
            for mx, nn in vals:
                cum += nn
                if cum >= k:
                    threshold = mx
                    break
    if threshold is None:
        return None  # not enough provably-qualifying rows: no bound

    kept: list[dict] = []
    skipped = 0
    for r, _state, n_rows in surviving:
        mn, mx, nl = bounds(r)
        try:
            if not asc:
                # excludable: all-NULL on c, or whole range below T
                if mx is None or mx < threshold:
                    skipped += 1
                    continue
            else:
                nl_known = nl is not None and nl == 0
                if threshold == "__ALL_VALUES_LOSE__":
                    if nl_known and mn is not None:
                        skipped += 1
                        continue
                elif nl_known and mn is not None and mn > threshold:
                    skipped += 1
                    continue
        except TypeError:
            pass  # incomparable stat: keep the file (sound)
        kept.append(r)
    if len(kept) >= total:
        return None  # nothing skipped anywhere: run the generic path
    files = sorted(r["file"] for r in kept)
    sizes = [r.get("file_bytes") for r in kept]
    stats = {
        "est_rows": sum(int(r["n_rows"]) for r in kept),
        "est_bytes": (
            sum(int(s) for s in sizes)
            if all(s is not None for s in sizes)
            else None
        ),
    }
    telemetry = {
        "col": col,
        "k": k,
        "direction": "asc" if asc else "desc",
        "files_total": total,
        "files_read": len(files),
        "files_skipped_by_bound": skipped,
    }
    return files, total, stats, telemetry
