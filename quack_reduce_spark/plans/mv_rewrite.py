"""Materialized-view query REWRITE for the SQL surface: answer an
aggregate query from a registered MV instead of the base table.

The reference dashboard re-issues the same aggregates per widget
refresh (``dashboard.py:37-39``); the classic warehouse answer
(Calcite/Snowflake/BigQuery MV rewrite) is to materialize the grouped
partials ONCE and transparently rewrite matching queries to read the
tiny MV. This module is the matching half:

- :func:`mv_spec` validates a CREATE query — it must be exactly the
  aggregate shape ``plans/agg_pushdown.py`` understands (one table,
  up to 4 group keys all selected, plain COUNT(*)/COUNT/SUM/MIN/MAX
  with mergeable/exact types, NO predicate) — and derives the
  canonical partial-column layout;
- :func:`try_rewrite` inspects a query's optimized plan with the SAME
  extractors and rewrites it over an MV when ALL hold:

  * same source table, and the MV is FRESH — its recorded source
    snapshot (one stat of the zone-map manifest list when the table
    has one: every commit rewrites ``_list.json`` last; else a capped
    per-file (mtime, size) listing) still matches the live table;
  * the query's group keys are a SUBSET of the MV's (any order; the
    empty subset is a global aggregate) — the classic ROLLUP
    containment: re-aggregating the finer per-group partials by the
    coarser keys is exact because every partial kind here is
    mergeable: counts/sums add, mins/maxes fold, AVG rebuilds as
    exact-sum / exact-count with one final double division (the
    agg-pushdown discipline);
  * every WHERE conjunct references an MV GROUP column — a predicate
    on a grouping column commutes with the grouping, so re-applying
    it to the MV rows (via agg_pushdown's exact
    ``residual_predicate``) filters exactly the rows the plain plan
    would aggregate, even when the filtered column is rolled away by
    the query's coarser grouping;
  * every query aggregate derives from a materialized partial:
    COUNT(*) -> SUM(n__star), COUNT(c) -> SUM(count__c),
    SUM(c) -> SUM(sum__c), MIN/MAX(c) -> MIN(mn)/MAX(mx),
    AVG(c) -> SUM(sum__c) / SUM(count__c).

Anything else declines and the query runs plain — a rewrite is an
accelerator, never a semantics change. Scalar COUNT rewrites coalesce
to 0 (SQL COUNT over an empty/fully-filtered table is 0, not NULL);
every other aggregate of no rows is NULL on both paths.

Exactness notes mirror the agg-pushdown gates the shared extractors
enforce: SUM only over integer-family/decimal(p<=18) columns (order-
independent), AVG only over the integer family; a double SUM/AVG never
reaches this module. Grouped rewrites touch exactly one MV row per
group, so even the folds are single-value.
"""

from __future__ import annotations

import json
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MV_FILE = "_mv.json"
# freshness fallback for un-manifested tables: stat at most this many
# files per check (a table past this should carry a zone-map manifest,
# whose single _list.json stat is the intended O(1) freshness token)
SNAP_MAX_FILES = 256


def _cname(kind: str, col: str | None) -> str:
    """Canonical MV partial-column name for one aggregate spec."""
    return "n__star" if kind == "count_star" else f"{kind}__{col}"


def source_snapshot(path: str) -> list | None:
    """JSON-safe freshness token for a source table. Zone-mapped
    tables stat ONE file — every manifest commit (write/append/
    optimize/OCC head flip) rewrites ``_zonemap/_list.json`` last, so
    its (mtime, size) is the table's change epoch (the same key the
    parsed-manifest caches trust). Plain tables fall back to a sorted
    per-file (mtime, size) listing capped at SNAP_MAX_FILES; None when
    no cheap token exists (the MV then never rewrites: sound)."""
    from quack_reduce_spark.lake import _fs_for, _join
    from quack_reduce_spark.operators.zonemaps import (
        LIST_FILE,
        ZONEMAP_DIR,
        _data_files,
    )

    fs = _fs_for(path)
    base = path.rstrip("/")
    lp = _join(_join(base, ZONEMAP_DIR), LIST_FILE)
    key = fs.stat_key(lp)
    if key is not None:
        return ["list", lp, list(key)]
    if not fs.is_dir(base):
        k = fs.stat_key(base)
        return None if k is None else ["files", [[base, list(k)]]]
    try:
        files = _data_files(base)
    except Exception:
        return None
    if not files or len(files) > SNAP_MAX_FILES:
        return None
    out = []
    for p in sorted(files):
        k = fs.stat_key(p)
        if k is None:
            return None
        out.append([p, list(k)])
    return ["files", out]


def mv_spec(df: DataFrame, paths_by_name: dict[str, str]) -> dict | None:
    """Validate a CREATE MATERIALIZED VIEW query and return its spec
    (source table, group column, canonical partial layout, source
    column types) or None when the query falls outside the exactly-
    understood aggregate surface. Creation is stricter than rewrite:
    no WHERE (predicate-containment is not implemented — materialize
    the whole grouping), no AVG (materialize SUM + COUNT instead; AVG
    *queries* then rewrite over the pair)."""
    from quack_reduce_spark.plans.agg_pushdown import (
        extract_grouped_agg,
        extract_scalar_agg,
    )

    info = extract_grouped_agg(df, paths_by_name) or extract_scalar_agg(
        df, paths_by_name
    )
    if info is None or info["conjuncts"]:
        return None
    if info["having"] or info["limit"] is not None:
        return None  # a filtered/truncated grouping is not mergeable
    if info["visible"] != list(range(len(info["aggs"]))):
        return None  # hidden auxiliary outputs: not a plain layout
    if any(kind == "avg" for kind, _c in info["aggs"]):
        return None
    if not any(kind != "key" for kind, _c in info["aggs"]):
        return None
    # every grouping key must be materialized (a key grouped on but
    # projected out would make the MV rows non-reaggregable)
    selected_keys = {c for k, c in info["aggs"] if k == "key"}
    if {g["gname"] for g in info["groups"]} - selected_keys:
        return None
    by_gname = {g["gname"]: g for g in info["groups"]}
    columns: dict[str, str] = {}
    select: list = []
    groups_out: list[dict] = []
    seen_keys: set[str] = set()
    for (kind, col), (oname, _t) in zip(info["aggs"], info["out"]):
        if kind == "key":
            if col in seen_keys:
                continue  # a key selected twice: materialize once
            seen_keys.add(col)
            g = by_gname[col]
            # derived (bucket) keys store under a sanitized physical
            # name; plain keys keep the source column name
            phys = (
                g["src"]
                if g["kind"] == "col"
                else f"g__{g['kind']}__{g['src']}"
            )
            groups_out.append({**g, "col": phys})
            select.append(F.col(oname).alias(phys))
            continue
        cn = _cname(kind, col)
        if cn in columns:
            continue  # duplicate aggregate spec: materialize once
        columns[cn] = oname
        select.append(F.col(oname).alias(cn))
    return {
        "table": info["table"],
        "groups": groups_out,
        "partials": sorted(columns),
        "types": info["types"],
        "_select": select,
    }


# bucket-granularity lattice: a query key of kind K_q derives from an
# MV key of kind K_m over the SAME source column when K_q is coarser-
# or-equal — each fine bucket maps to exactly ONE coarse bucket, so
# re-bucketing the MV rows is exact set algebra. 'col' (the raw value)
# is the finest granularity.
_BUCKET_ORDER = {"col": 0, "to_date": 1, "trunc_month": 2,
                 "trunc_year": 3, "year": 4}


def _rebucket_col(q_kind: str, mv_kind: str, c):
    """Column deriving the QUERY's bucket from the MV's stored key
    column. Callers pre-check the lattice; mv kinds store date values
    except 'col' (raw date / NTZ timestamp, cast first)."""
    if q_kind == mv_kind:
        return c
    d = c.cast("date") if mv_kind == "col" else c
    if q_kind == "to_date":
        return d
    if q_kind == "trunc_month":
        return F.trunc(d, "month")
    if q_kind == "trunc_year":
        return F.trunc(d, "year")
    return F.year(d)  # year


def _match_group(qg: dict, mv_groups: list[dict]) -> dict | None:
    """The MV key spec the query group ``qg`` derives from (exact
    gname match, or a strictly coarser bucket over the same source),
    or None."""
    for mg in mv_groups:
        if mg["gname"] == qg["gname"]:
            return mg
    if qg["kind"] == "col":
        return None  # a raw value never derives from a bucket
    for mg in mv_groups:
        if (
            mg["src"] == qg["src"]
            and _BUCKET_ORDER.get(qg["kind"], -1)
            > _BUCKET_ORDER.get(mg["kind"], 99)
        ):
            return mg
    return None


def load_mv(path: str) -> dict | None:
    """Parse ``<mv path>/_mv.json``; None when absent/unreadable."""
    from quack_reduce_spark.lake import _fs_for, _join

    p = _join(path.rstrip("/"), MV_FILE)
    fs = _fs_for(p)
    try:
        return json.loads(fs.read_text(p))
    except Exception:
        return None


def save_mv(path: str, meta: dict) -> None:
    from quack_reduce_spark.lake import _fs_for, _join

    p = _join(path.rstrip("/"), MV_FILE)
    doc = {k: v for k, v in meta.items() if not k.startswith("_")}
    _fs_for(p).write_text_atomic(p, json.dumps(doc, indent=1, sort_keys=True))


def try_rewrite(
    spark: SparkSession,
    df: DataFrame,
    paths_by_name: dict[str, str],
    mvs: dict[str, dict],
) -> tuple[DataFrame, dict] | None:
    """Rewrite ``df`` over the first matching fresh MV; None when no
    MV matches (the query runs plain)."""
    from quack_reduce_spark.plans.agg_pushdown import (
        extract_grouped_agg,
        extract_scalar_agg,
    )

    info = extract_grouped_agg(df, paths_by_name) or extract_scalar_agg(
        df, paths_by_name
    )
    if info is None:
        return None
    grouped = bool(info["groups"])
    for name, mv in mvs.items():
        if mv["table"] != info["table"]:
            continue
        mv_groups = _norm_groups(mv["groups"])
        # ROLLUP containment across BOTH lattices: every query key must
        # be an MV key or a coarser bucket of one (each fine bucket
        # maps to exactly one coarse bucket), and re-aggregating the
        # finer partials is exact because every partial kind merges
        matches = [
            (qg, _match_group(qg, mv_groups)) for qg in info["groups"]
        ]
        if any(mg is None for _qg, mg in matches):
            continue
        plain_srcs = {g["src"] for g in mv_groups if g["kind"] == "col"}
        if any(c not in plain_srcs for c, _o, _v in info["conjuncts"]):
            continue  # predicates must hit a PLAIN (raw-value) MV key:
            # only those commute with the grouping exactly
        partials = set(mv["partials"])
        needed: set[str] = set()
        ok = True
        for kind, col in info["aggs"]:
            if kind == "key":
                continue
            if kind == "avg":
                need = {_cname("sum", col), _cname("count", col)}
            else:
                need = {_cname(kind, col)}
            if not need <= partials:
                ok = False
                break
            needed |= need
        if not ok:
            continue
        # freshness LAST (it stats the filesystem; shape checks are free)
        if mv.get("snapshot") is None:
            continue
        if source_snapshot(mv["source_path"]) != mv["snapshot"]:
            continue
        return _build(spark, info, mv, name, matches)
    return None


def _norm_groups(gs: list) -> list[dict]:
    """Normalize group entries: pre-bucket _mv.json files stored bare
    column-name strings."""
    return [
        g if isinstance(g, dict)
        else {"kind": "col", "src": g, "gname": g, "col": g}
        for g in gs
    ]


def _build(
    spark: SparkSession,
    info: dict,
    mv: dict,
    name: str,
    matches: list,
) -> tuple[DataFrame, dict]:
    from quack_reduce_spark.plans.agg_pushdown import (
        finish_frame,
        residual_predicate,
    )

    grouped = bool(info["groups"])
    base = spark.read.parquet(mv["path"])
    # query-group key columns, rebucketed from the matched MV keys and
    # aliased __k{j} in query-group order
    key_exprs = [
        _rebucket_col(qg["kind"], mg["kind"], F.col(mg["col"])).alias(
            f"__k{j}"
        )
        for j, (qg, mg) in enumerate(matches)
    ]
    key_by_gname = {
        qg["gname"]: f"__k{j}" for j, (qg, _mg) in enumerate(matches)
    }
    if info["conjuncts"]:
        # group-column types recorded at MV creation keep the epoch-
        # space discipline for session-zoned timestamps (group keys
        # are currently zone-free types, but the predicate builder is
        # shared with the agg path and handles all of them)
        types = dict(mv.get("types") or {})
        types.update(info["types"])
        base = base.where(residual_predicate(info["conjuncts"], types))
    partial_exprs: list = []
    for i, (kind, col) in enumerate(info["aggs"]):
        if kind == "key":
            continue
        if kind in ("count_star", "count"):
            partial_exprs.append(
                F.sum(F.col(_cname(kind, col))).alias(f"__p{i}")
            )
        elif kind == "sum":
            partial_exprs.append(
                F.sum(F.col(_cname("sum", col))).alias(f"__p{i}")
            )
        elif kind == "min":
            partial_exprs.append(
                F.min(F.col(_cname("min", col))).alias(f"__p{i}")
            )
        elif kind == "max":
            partial_exprs.append(
                F.max(F.col(_cname("max", col))).alias(f"__p{i}")
            )
        else:  # avg
            partial_exprs.append(
                F.sum(F.col(_cname("sum", col)).cast("decimal(38,0)"))
                .alias(f"__p{i}s")
            )
            partial_exprs.append(
                F.sum(F.col(_cname("count", col))).alias(f"__p{i}n")
            )
    if not partial_exprs:
        # all-keys query (SELECT DISTINCT k): the MV's (rebucketed)
        # groups ARE the distinct key tuples of the source
        agged = base.select(*key_exprs).distinct()
    elif grouped:
        agged = base.groupBy(*key_exprs).agg(*partial_exprs)
    else:
        agged = base.agg(*partial_exprs)
    outs = []
    for i, (kind, col) in enumerate(info["aggs"]):
        if kind == "key":
            expr = F.col(key_by_gname[col])
        elif kind in ("count_star", "count"):
            # COUNT of no rows is 0: a scalar rewrite over an empty /
            # fully-filtered MV sums nothing and must not emit NULL
            expr = F.coalesce(F.col(f"__p{i}"), F.lit(0))
        elif kind == "avg":
            cnt = F.coalesce(F.col(f"__p{i}n"), F.lit(0))
            expr = F.when(cnt == 0, F.lit(None)).otherwise(
                F.col(f"__p{i}s").cast("double") / cnt
            )
        else:
            expr = F.col(f"__p{i}")
        outs.append(
            expr.cast(info["out_all_types"][i]).alias(f"__o{i}")
        )
    frame = finish_frame(agged.select(*outs), info)
    telemetry = {
        "view": name,
        "table": info["table"],
        "mv_path": mv["path"],
        "grouped": grouped,
        "aggs": [
            f"{k}({c})" if c is not None else "count(*)"
            for k, c in info["aggs"]
        ],
    }
    return frame, telemetry
