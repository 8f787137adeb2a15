"""Zone-map pushdown for the SQL surface: physical-plan constraint
extraction + manifest-planned view rebinding.

The round-9 zone-map layer (operators/zonemaps.py) prunes files when a
caller invokes ``scan_pruned()`` explicitly. This module makes the
ENGINE do it: ``Engine.sql``/``Engine.df`` detect range and IN-list
predicates on a zone-mapped table's stats columns in the query's own
PHYSICAL plan and re-plan the scan from the manifest — the user writes
plain SQL (the reference's whole UX, ``app.py:51``) and gets
Iceberg/Delta-style stats skipping on plain parquet for free.

How constraints are found — asked of Catalyst, not parsed from SQL:
``spark.sql(query)`` is planned (analysis + optimization only, no
execution) and every ``FileSourceScanExec`` leaf is inspected via the
JVM bridge. A scan's ``dataFilters`` are the optimizer's OWN conjuncts
(post constant-folding, post pushdown-splitting), so everything the
rewriter produces from BETWEEN / CTE inlining arrives here already
normalized. Conjuncts of the shape ``<attr> <cmp> <literal>`` over a
manifest stats column become closed-interval bounds (strict bounds
widen to closed — pruning needs only a SUPERSET of the matching files
to stay sound, because the query re-applies its full predicate when it
executes); ``<attr> IN (<literals>)`` becomes a VALUE SET — each file
survives iff some value can sit inside its [min, max], strictly
tighter than the IN-list's min/max envelope when the list is sparse.

Soundness rules (pruning can cost reads, never correctness):
- per SCAN, bounds on different columns INTERSECT (all must hold);
- per TABLE, the surviving file sets of different scans UNION (a
  self-join's two scans each need their own files);
- a scan of the table with NO usable bound disables pruning for the
  whole table (it needs every file);
- unrecognized expression shapes / uncomparable literal types are
  simply ignored (no bound extracted -> no pruning from them).

Timestamps: Catalyst session-zoned ``timestamp`` literals carry epoch
micros; manifest min/max values are collected through PySpark, which
renders them as naive datetimes in ``spark.sql.session.timeZone``. The
literal is therefore decoded IN THE SESSION ZONE (not hard-coded UTC),
so pruning stays correct when the engine runs inside a user session
whose zone is not UTC. ``timestamp_ntz`` literals are wall-clock and
decode without conversion.

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
_EPOCH_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

# comparison node -> (bound-kind when attr is on the LEFT)
_CMP_LEFT = {
    "GreaterThanOrEqual": "lo",
    "GreaterThan": "lo",  # strict widens to closed: superset, sound
    "LessThanOrEqual": "hi",
    "LessThan": "hi",
    "EqualTo": "eq",
    # null-safe equality with a non-null literal == plain equality
    # (NULL literals never reach here: _literal_py reports unusable)
    "EqualNullSafe": "eq",
}
_FLIP = {"lo": "hi", "hi": "lo", "eq": "eq"}

# LIKE 'abc%' arrives as StartsWith(attr, 'abc'): every matching string
# sits in [prefix, prefix + U+10FFFF...) lexicographically — Spark
# compares strings by UTF-8 bytes and Python by code points, the same
# total order for valid Unicode, so the closed superset
# [prefix, prefix + chr(0x10FFFF)] prunes soundly against collected
# min/max strings.
_PREFIX_MAX = chr(0x10FFFF)


def _bare(p: str) -> str:
    return "/" + p.split("://")[-1].removeprefix("file:").lstrip("/")


def _internal_py(v: Any, type_name: str, session_tz: str) -> tuple[Any, bool]:
    """Python value of a Catalyst-INTERNAL-form value, (value, usable).
    Dates and timestamps arrive as days / micros since epoch; strings
    as UTF8String JVM objects. Session-zoned timestamp micros convert
    to the SESSION timezone's naive rendering — the form manifest
    values take when collected — so a non-UTC session cannot shift a
    bound by its zone offset and mis-prune. Types we can't compare
    portably against manifest values (decimal, binary, interval...)
    report unusable."""
    if v is None:
        return None, False
    if type_name == "date":
        return _EPOCH_DATE + _dt.timedelta(days=int(v)), True
    if type_name == "timestamp_ntz":
        # wall-clock micros: no zone applies
        return _EPOCH_TS + _dt.timedelta(microseconds=int(v)), True
    if type_name == "timestamp":
        try:
            from zoneinfo import ZoneInfo

            zone = ZoneInfo(session_tz)
        except Exception:
            return None, False  # unresolvable zone: no bound (sound)
        aware = _EPOCH_UTC + _dt.timedelta(microseconds=int(v))
        return aware.astimezone(zone).replace(tzinfo=None), True
    if type_name == "string":
        return v if isinstance(v, str) else v.toString(), True
    if type_name in ("integer", "long", "short", "byte", "double", "float"):
        return v, True
    return None, False


def _literal_py(lit: Any, session_tz: str) -> tuple[Any, bool]:
    """Python value of a Catalyst Literal, (value, usable) — the
    Literal holds its value in internal form (see _internal_py)."""
    return _internal_py(lit.value(), lit.dataType().typeName(), session_tz)


def _ident(v: Any) -> Any:
    return v


def _to_date(v: Any) -> Any:
    # date column compared THROUGH a cast to timestamp: flooring the
    # literal to its date keeps a SUPERSET of the matching files for
    # every bound kind (lo floors = widens, hi floors = exact, eq/IN
    # floors = possibly keeps files an impossible non-midnight value
    # never matches — extra reads, never missing rows)
    return v.date() if isinstance(v, _dt.datetime) else v


# (source column type, cast target type) -> literal converter, for the
# cast shapes Catalyst leaves around attributes in In-lists (binary
# comparisons get unwrapped by UnwrapCastInBinaryComparison; In does
# not). Only pairs where comparing the converted literal against the
# SOURCE-typed manifest stats is sound appear here.
_INT_WIDEN = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"), ("integer", "long"),
    ("float", "double"),
}
_SAFE_CASTS: dict[tuple[str, str], Any] = {
    # NTZ wall-clock == the session-zone naive rendering the literal
    # decoder produces for a session-zoned timestamp literal
    ("timestamp_ntz", "timestamp"): _ident,
    ("date", "timestamp"): _to_date,
    ("date", "timestamp_ntz"): _to_date,
    **{pair: _ident for pair in _INT_WIDEN},
}


def _unwrap_attr(e: Any) -> tuple[str | None, Any]:
    """(column name, literal-converter) when ``e`` is an attribute or
    a SAFE cast of one, else (None, None)."""
    n = e.getClass().getSimpleName()
    if n == "AttributeReference":
        return e.name(), _ident
    if n == "Cast":
        child = e.child()
        if child.getClass().getSimpleName() != "AttributeReference":
            return None, None
        conv = _SAFE_CASTS.get(
            (child.dataType().typeName(), e.dataType().typeName())
        )
        if conv is None:
            return None, None
        return child.name(), conv
    return None, None


def _side(e: Any) -> tuple[str | None, Any]:
    n = e.getClass().getSimpleName()
    if n == "Literal":
        return "lit", e
    name, conv = _unwrap_attr(e)
    if name is not None:
        return "attr", (name, conv)
    return None, None


def _conjunct_bound(e: Any, session_tz: str) -> tuple[str, str, Any] | None:
    """(column, 'lo'|'hi'|'eq'|'in', value) from one dataFilters
    conjunct, or None when the shape isn't ``attr cmp literal`` /
    ``attr IN (literals)``. An In whose list holds any non-literal or
    unusable value extracts nothing (sound). Catalyst keeps small
    IN-lists as ``In`` (the common dashboard shape); large ones become
    ``InSet`` with values in internal form and are left alone — the
    scan simply isn't pruned by them."""
    name = e.getClass().getSimpleName()
    if name == "In":
        lk, got = _side(e.value())
        if lk != "attr":
            return None
        colname, conv = got
        vals = []
        lst = e.list()
        for j in range(lst.size()):
            kind, lit = _side(lst.apply(j))
            if kind != "lit":
                return None
            v, ok = _literal_py(lit, session_tz)
            if not ok:
                return None
            vals.append(conv(v))
        if not vals:
            return None
        return colname, "in", frozenset(vals)
    if name == "InSet":
        # IN-lists past spark.sql.optimizer.inSetConversionThreshold
        # (default 10) compile to InSet with values in Catalyst
        # INTERNAL form (epoch micros/days, UTF8String) — the big
        # dashboard IN. Decoded per the child expression's type (the
        # CAST's type when one wraps the attribute; conv maps back to
        # the column's domain). Bounded: a set past _MAX_INSET values
        # costs more per-file work than it prunes — left alone.
        lk, got = _side(e.child())
        if lk != "attr":
            return None
        colname, conv = got
        hs = e.hset()
        if hs.size() > _MAX_INSET:
            return None
        tname = e.child().dataType().typeName()
        vals = []
        it = hs.iterator()
        while it.hasNext():
            v, ok = _internal_py(it.next(), tname, session_tz)
            if not ok:
                return None
            vals.append(conv(v))
        if not vals:
            return None
        return colname, "in", frozenset(vals)
    if name in ("IsNull", "IsNotNull"):
        lk, got = _side(e.child())
        if lk != "attr":
            return None
        colname, _conv = got  # safe casts preserve nullness (ANSI:
        # cast failures raise rather than null out), so the child
        # attribute's nullness is the cast's nullness
        return colname, ("isnull" if name == "IsNull" else "isnotnull"), None
    if name == "StartsWith":
        lk, got = _side(e.left())
        rk, lit = _side(e.right())
        if lk != "attr" or rk != "lit":
            return None
        colname, conv = got
        if conv is not _ident:  # prefix semantics don't survive casts
            return None
        v, ok = _literal_py(lit, session_tz)
        if not ok or not isinstance(v, str) or not v:
            return None
        return colname, "pref", v
    kind = _CMP_LEFT.get(name)
    if kind is None:
        return None
    lk, lv = _side(e.left())
    rk, rv = _side(e.right())
    if lk == "attr" and rk == "lit":
        (col, conv), lit, flip = lv, rv, False
    elif lk == "lit" and rk == "attr":
        (col, conv), lit, flip = rv, lv, True
    else:
        return None
    val, ok = _literal_py(lit, session_tz)
    if not ok:
        return None
    return col, (_FLIP[kind] if flip else kind), conv(val)


def _merge_bound(bounds: dict, col: str, kind: str, val: Any) -> None:
    """Fold one conjunct into the per-scan constraint map
    ``{col: [lo, hi, vals, nullness]}`` — conjuncts on the same column
    INTERSECT: ranges tighten lo/hi, IN-lists intersect value sets,
    a range over an existing value set filters it, and IS [NOT] NULL
    sets the nullness flag (a conflicting pair leaves 'null' — the
    predicate is then unsatisfiable, and ANY file subset is a sound
    superset of its empty match set)."""
    lo, hi, vals, nullness = bounds.get(col, (None, None, None, None))
    if kind == "isnull":
        nullness = "null"
    elif kind == "isnotnull":
        nullness = nullness or "notnull"
    elif kind == "in":
        vals = val if vals is None else (vals & val)
    elif kind == "pref":
        # prefix p -> closed superset range [p, p + MAX]
        if lo is None or _gt(val, lo):
            lo = val
        top = val + _PREFIX_MAX
        if hi is None or _lt(top, hi):
            hi = top
    else:
        if kind in ("lo", "eq") and (lo is None or _gt(val, lo)):
            lo = val
        if kind in ("hi", "eq") and (hi is None or _lt(val, hi)):
            hi = val
    bounds[col] = (lo, hi, vals, nullness)


def _gt(a, b) -> bool:
    try:
        return a > b
    except TypeError:
        return False


def _lt(a, b) -> bool:
    try:
        return a < b
    except TypeError:
        return False


def _finalize(bounds: dict) -> dict[str, tuple]:
    """Apply range bounds to value sets: a constraint with both an
    IN-list and a range keeps only in-range values (their conjunction).
    An IS NULL constraint drops any value bounds (only NULL rows can
    match — value bounds on the same column make the predicate
    unsatisfiable, and pruning by null-count alone stays a sound
    superset). Columns whose constraints are vacuous drop out."""
    out: dict[str, tuple] = {}
    for col, (lo, hi, vals, nullness) in bounds.items():
        if nullness == "null":
            out[col] = (None, None, None, "null")
        elif vals is not None:
            kept = frozenset(
                v
                for v in vals
                if not (lo is not None and _lt(v, lo))
                and not (hi is not None and _gt(v, hi))
            )
            out[col] = (None, None, kept, nullness)
        elif lo is not None or hi is not None or nullness is not None:
            out[col] = (lo, hi, None, nullness)
    return out


# DNF expansion cap: a conjunction of ORs multiplies alternatives; a
# predicate that would expand past this many stays un-pruned (sound)
# rather than exploding planning work.
_MAX_ALTS = 16
# InSet decode cap: each value costs a py4j round trip at plan time
# and one interval check per candidate file.
_MAX_INSET = 256


def _dnf_triples(e: Any, session_tz: str) -> list[list[tuple]] | None:
    """Disjunctive normal form of one dataFilters conjunct as a list
    of alternatives, each a list of (col, kind, val) atomic bounds —
    ``(a AND b) OR c`` becomes ``[[a, b], [c]]``. None means the
    expression (or a disjunct of it) is unextractable: the caller must
    treat the WHOLE conjunct as unusable, because dropping one OR arm
    would narrow the match set (unsound), unlike dropping a whole
    AND conjunct (which only widens)."""
    name = e.getClass().getSimpleName()
    if name == "Or":
        left = _dnf_triples(e.left(), session_tz)
        right = _dnf_triples(e.right(), session_tz)
        if left is None or right is None:
            return None
        if len(left) + len(right) > _MAX_ALTS:
            return None
        return left + right
    if name == "And":
        left = _dnf_triples(e.left(), session_tz)
        right = _dnf_triples(e.right(), session_tz)
        if left is None or right is None:
            return None
        if len(left) * len(right) > _MAX_ALTS:
            return None
        return [a + b for a in left for b in right]
    got = _conjunct_bound(e, session_tz)
    if got is None:
        return None
    return [[got]]


def scan_constraints(
    df: DataFrame, paths_by_name: dict[str, str]
) -> dict[str, list[dict]]:
    """Per registered table: one scan record PER SCAN of that table in
    ``df``'s physical plan — ``{"alts": [...], "n_files": live_count}``
    where ``alts`` is a DNF list of alternative constraint dicts
    ``{col: (lo, hi, vals, nullness)}`` (a plain conjunction yields one
    alternative; each top-level OR arm adds one; a scan's surviving
    files are the UNION over alternatives). An empty/unextractable
    predicate contributes ``alts == [{}]`` — the caller must treat an
    alternative with no usable bounds as 'needs all files'.

    ``paths_by_name``: view name -> resolved data dir; scans are
    matched to tables by file-index root path."""
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    name_by_root = {_bare(p): n for n, p in paths_by_name.items()}
    out: dict[str, list[dict]] = {}
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
        # each top-level conjunct is a DNF of alternatives; the scan's
        # alternatives are their cross product (bounded), each folded
        # into one finalized constraint dict
        alt_triples: list[list[tuple]] = [[]]
        filters = leaf.dataFilters()
        for j in range(filters.size()):
            dnf = _dnf_triples(filters.apply(j), session_tz)
            if dnf is None or len(dnf) * len(alt_triples) > _MAX_ALTS:
                continue  # unusable conjunct: ignore it (widens, sound)
            alt_triples = [a + d for a in alt_triples for d in dnf]
        alts = []
        for triples in alt_triples:
            bounds: dict[str, tuple] = {}
            for col, kind, val in triples:
                _merge_bound(bounds, col, kind, val)
            alts.append(_finalize(bounds))
        # the scan's LIVE file count, read off its own file index: the
        # engine compares it against the manifest's total to refuse
        # pruning a table whose manifest went stale (files appended
        # without append_zonemap would otherwise be silently DROPPED
        # by the rebind — the one way zone maps could lose rows)
        n_live = int(len(leaf.relation().location().inputFiles()))
        out.setdefault(name, []).append({"alts": alts, "n_files": n_live})
    return out


_SHUFFLE_JOINS = {"SortMergeJoinExec", "ShuffledHashJoinExec"}


def join_scan_tables(df: DataFrame, paths_by_name: dict[str, str]) -> set[str]:
    """Registered tables scanned UNDER a shuffle join (sort-merge or
    shuffled-hash) in ``df``'s physical plan — the candidates for an
    estimate-driven broadcast hint (a side already broadcast needs no
    help). Best-effort: any bridge drift returns the empty set."""
    name_by_root = {_bare(p): n for n, p in paths_by_name.items()}
    out: set[str] = set()

    def scan_names(node: Any) -> set[str]:
        names: set[str] = set()
        leaves = node.collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() != "FileSourceScanExec":
                continue
            roots = leaf.relation().location().rootPaths()
            got = {
                name_by_root.get(_bare(roots.apply(j).toString()))
                for j in range(roots.size())
            }
            got.discard(None)
            names |= got
        return names

    plan = df._jdf.queryExecution().sparkPlan()
    stack = [plan]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() in _SHUFFLE_JOINS:
            out |= scan_names(node)
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return out


def plan_pruned_files(
    spark,
    data_dir: str,
    stats_cols: list[str],
    scans: list[dict],
) -> tuple[list[str], int, dict] | None:
    """Resolve per-scan constraints into ONE surviving file list for
    the table, or None when pruning can't apply (some alternative of
    some scan is unconstrained on every stats column, the manifest is
    STALE — its file count differs from the scan's live file index,
    meaning someone appended without append_zonemap and pruning could
    drop their rows — or nothing would be skipped). Each scan is
    ``{"alts": [{col: (lo, hi, vals, nullness)}, ...], "n_files":
    live_count}``. Within an alternative, columns intersect
    (prune_files_multi); across a scan's alternatives (OR arms) AND
    across scans, survivor sets union. Returns ``(files, total_files,
    stats)`` where ``stats`` carries the survivors' summed ``n_rows``
    / ``file_bytes`` (None when the manifest predates size recording)
    — the estimate the engine's broadcast-hint decision reads."""
    from quack_reduce_spark.operators.zonemaps import prune_files_multi

    union: dict[str, dict] = {}
    total = None
    for scan in scans:
        for bounds in scan["alts"]:
            usable = {c: b for c, b in bounds.items() if c in stats_cols}
            if not usable:
                return None  # this alternative needs every file
            rows, total = prune_files_multi(spark, data_dir, usable)
            if scan["n_files"] != total:
                return None  # manifest stale vs the live file set: refuse
            for r in rows:
                union[r["file"]] = r
    if total is None or len(union) >= total:
        return None
    survivors = sorted(union)
    sizes = [union[f].get("file_bytes") for f in survivors]
    stats = {
        "est_rows": sum(int(union[f]["n_rows"]) for f in survivors),
        "est_bytes": (
            sum(int(s) for s in sizes) if all(s is not None for s in sizes) else None
        ),
    }
    return survivors, total, stats
