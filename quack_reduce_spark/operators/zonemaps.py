"""File-level zone maps: partition-grouped min/max manifests + data skipping.

Parquet footers already carry per-row-group min/max statistics, but a
100 TB table is *thousands of files*, and the scan planner must still
LIST and open every footer to discover that 99% of them cannot match a
selective predicate. Table formats (Iceberg manifests, Delta
``add``-action stats) fix this by hoisting per-FILE min/max into a
small metadata artifact read once at planning time. This module
rebuilds that mechanism on plain parquet, in the Iceberg shape —
a MANIFEST LIST over PER-PARTITION MANIFESTS:

- :func:`write_zonemap` aggregates per-file ``(n_rows, min, max,
  n_null)`` for chosen columns in ONE distributed pass over the table
  (grouping on the hidden ``_metadata.file_path`` column) and writes
  the stats under ``<table>/_zonemap/`` — an underscore-prefixed
  directory, which Spark's file index treats as hidden, so normal
  table scans never see it. Stats rows are partitioned into ONE
  MANIFEST PER DATA DIRECTORY (= per hive partition; flat layouts get
  a single group) via ``write.partitionBy`` — a single distributed
  write, no per-group driver loop — plus a tiny JSON *manifest list*
  (``_zonemap/_list.json``) recording, per group: the directory, its
  file count, and group-level [lo, hi] per stats column.
- :func:`append_zonemap` is the Iceberg append-commit shape: only the
  NEW files are statted, and only the TOUCHED partitions' manifests
  are rewritten (Spark dynamic partition overwrite); untouched
  partitions' manifests are never read, rewritten, or even listed.
  Maintenance cost tracks the DELTA, not the table — at a million
  files, an append to today's partition rewrites one small manifest,
  not an O(#files) blob (the round-9 design nit this layout fixes).
- :func:`prune_files` reads the manifest list FIRST: partition groups
  whose group-level ``[lo, hi]`` cannot intersect the query range are
  skipped without opening their manifests at all; surviving groups'
  manifests are then read (one Spark job over only those paths) and
  filtered file-by-file. A file survives iff its ``[min, max]``
  interval intersects ``[lo, hi]`` (an all-NULL file has NULL min/max
  and is skipped — a range predicate cannot match NULL).
- :func:`scan_pruned` reads ONLY the surviving files and re-applies
  the exact predicate (zone maps prune, they never filter), so the
  result is row-for-row identical to a full-table filter — the
  invariant ``tests/test_zonemaps.py`` verifies on sorted, random,
  and z-ordered layouts.

Scale notes. The manifest build is one map-side-combinable aggregate
keyed on file path — #files output rows regardless of table size.
Planning reads the manifest list (#partitions entries) and then only
the candidate partitions' manifests; only SURVIVING file paths are
collected to the driver (the standard planning cost every table
format pays). Pruning power is a *layout* property: clustering the
write by the filter column (``repartitionByRange`` +
``sortWithinPartitions``, or
:func:`~quack_reduce_spark.operators.zorder.zorder_write` for two
dimensions) gives each file a tight bounding box; a random layout
degrades gracefully to reading everything — never to a wrong answer.

Legacy layouts (round-9 single-file manifests, no ``_list.json``) are
still read correctly and are upgraded in place — from their own rows,
no table rescan — on the first :func:`append_zonemap`.

The reference has no stats layer at all — its serverless engine
re-lists and re-opens objects per query (``quack.py:145``,
``benchmark.py:45``) and its README defers table formats
(``README.md:190``); this closes the same gap the lake.py commit
protocol does, from the read-planning side.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

ZONEMAP_DIR = "_zonemap"
LIST_FILE = "_list.json"


# -- path normalization (Spark reports file:/ URIs; fs walks report bare) --


def _bare(p: str) -> str:
    """Scheme-less path: ``file:///x`` / ``file:/x`` / ``/x`` → ``/x``."""
    return "/" + p.split("://")[-1].removeprefix("file:").lstrip("/")


def _bare_col(c: Column) -> Column:
    return F.regexp_replace(c, "^[a-zA-Z0-9]+:/+", "/")


def _dirname(p: str) -> str:
    return p.rsplit("/", 1)[0]


def _dirname_col(c: Column) -> Column:
    # left(p, len - position of first '/' in reverse) == dirname
    return F.substring(c, F.lit(1), F.length(c) - F.instr(F.reverse(c), "/"))


def _token(rel: str) -> str:
    return hashlib.md5(rel.encode()).hexdigest()[:12]


def _group_cols(file_col: Column) -> tuple[Column, Column]:
    """(group-token, group-dir) columns from a file-path column — the
    token is md5(normalized dirname)[:12], matching :func:`_token` on
    driver-side walked paths (Spark's md5 is lowercase hex, same as
    hashlib)."""
    gdir = _dirname_col(_bare_col(file_col))
    return F.substring(F.md5(gdir), 1, 12), gdir


# -- manifest-list JSON codec (typed lo/hi values) -------------------------

# Sentinel for a bound the list can't represent (unencodable type, or
# a timestamp whose build-session timezone is unknowable): the group
# must be KEPT — distinct from None, which means "all NULL" and is
# safely prunable under a range predicate.
_UNKNOWN = object()


def _enc(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"t": "date", "v": v.isoformat()}
    if isinstance(v, (int, float, str, bool)):
        return {"t": type(v).__name__, "v": v}
    # unencodable type (Decimal, bytes, ...): record as unknown — the
    # group can then never be list-pruned (sound: pruning degrades to
    # reading its manifest, never to a wrong answer)
    return {"t": "?", "v": None}


def _dec(e: Any, doc_tz: str | None = None, session_tz: str | None = None,
         col_type: str | None = None) -> Any:
    """Decode a list-doc bound. Timestamp bounds were serialized as the
    BUILD session's naive rendering; when the doc records its timezone
    and the reading session's differs, session-zoned (``timestamp``)
    bounds are converted — NTZ values are wall-clock and never shift.
    A timestamp bound whose build timezone is unknown (legacy doc) in a
    session with a different zone decodes to ``_UNKNOWN``: the group is
    kept rather than mis-pruned."""
    if e is None:
        return None
    if e.get("t") == "?":
        return _UNKNOWN
    t, v = e["t"], e["v"]
    if t == "ts":
        val = _dt.datetime.fromisoformat(v)
        if col_type == "timestamp" and session_tz and doc_tz != session_tz:
            if doc_tz is None:
                return _UNKNOWN  # legacy doc: build tz unrecorded
            from zoneinfo import ZoneInfo

            return (
                val.replace(tzinfo=ZoneInfo(doc_tz))
                .astimezone(ZoneInfo(session_tz))
                .replace(tzinfo=None)
            )
        return val
    if t == "date":
        return _dt.date.fromisoformat(v)
    return v


def _list_path(data_dir: str) -> str:
    return f"{data_dir.rstrip('/')}/{ZONEMAP_DIR}/{LIST_FILE}"


# Parsed-manifest caches, keyed on the manifest list's mtime: every
# manifest mutation (write_zonemap, append_zonemap, legacy upgrade)
# commits by rewriting _list.json LAST, so its mtime is the cache
# epoch for the whole _zonemap tree. Entries are only ever replaced
# with a fresh parse of the same path (GIL-atomic dict ops; a racing
# reader at worst re-reads). IO_COUNTS tracks ACTUAL reads so tests
# can assert that N queries on an unchanged table hit disk once.
_LIST_CACHE: dict[str, tuple[float, dict]] = {}
_GROUP_CACHE: dict[tuple[str, str], tuple[tuple, list[dict]]] = {}
IO_COUNTS = {"list_reads": 0, "group_reads": 0}


def _read_list(data_dir: str) -> dict | None:
    """Parsed manifest list (cached). The returned dict is the SHARED
    cache object — callers must treat it as immutable."""
    doc, _ = _read_list_cached(data_dir)
    return doc


def _read_list_cached(data_dir: str) -> tuple[dict | None, float | None]:
    """(parsed manifest list, its mtime) — served from the cache while
    the file's mtime is unchanged."""
    from quack_reduce_spark.lake import _fs_for

    fs = _fs_for(data_dir)
    p = _list_path(data_dir)
    mt = fs.mtime(p)
    if mt is None:
        _LIST_CACHE.pop(data_dir, None)
        return None, None
    hit = _LIST_CACHE.get(data_dir)
    if hit is not None and hit[0] == mt:
        return hit[1], mt
    IO_COUNTS["list_reads"] += 1
    doc = json.loads(fs.read_text(p))
    _LIST_CACHE[data_dir] = (mt, doc)
    return doc, mt


def _invalidate_cache(data_dir: str) -> None:
    _LIST_CACHE.pop(data_dir, None)
    for key in [k for k in _GROUP_CACHE if k[0] == data_dir]:
        _GROUP_CACHE.pop(key, None)


def _write_list(
    data_dir: str,
    cols: list[str],
    groups: dict[str, dict],
    tz: str | None = None,
    types: dict[str, str] | None = None,
) -> None:
    from quack_reduce_spark.lake import _fs_for

    doc = {"version": 2, "cols": cols, "groups": groups}
    if tz:
        doc["tz"] = tz  # build-session zone: lets readers in another
        # zone convert session-zoned timestamp bounds instead of
        # losing list-level pruning on them
    if types:
        doc["types"] = types
    _fs_for(data_dir).write_text_atomic(_list_path(data_dir), json.dumps(doc, indent=1))
    _invalidate_cache(data_dir)


def _group_summaries(stats_g: DataFrame, cols: list[str]) -> dict[str, dict]:
    """Manifest-list entries from a stats frame that carries ``__g``
    (token) and ``__gdir`` columns: per group — dir, file count, and
    group-level [lo, hi] per stats column. One aggregate onto
    #partitions rows; the only driver materialization in the build."""
    aggs = [F.first("__gdir").alias("dir"), F.count(F.lit(1)).alias("n_files")]
    for c in cols:
        aggs.append(F.min(f"min_{c}").alias(f"lo_{c}"))
        aggs.append(F.max(f"max_{c}").alias(f"hi_{c}"))
    out: dict[str, dict] = {}
    for r in stats_g.groupBy("__g").agg(*aggs).collect():
        out[r["__g"]] = {
            "dir": r["dir"],
            "n_files": int(r["n_files"]),
            "stats": {
                c: {"lo": _enc(r[f"lo_{c}"]), "hi": _enc(r[f"hi_{c}"])} for c in cols
            },
        }
    return out


# -- stats build -----------------------------------------------------------


def _stat_aggs(cols: list[str]) -> list[Column]:
    # file_bytes (from the hidden _metadata column) feeds the engine's
    # broadcast-hint estimate: surviving-file bytes are the same units
    # Spark's own static size stats compare against the broadcast
    # threshold, so no row-width guessing is involved
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min("__fsize").alias("file_bytes"),
    ]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"))
    return aggs


def _stat_types(stats: DataFrame, cols: list[str]) -> dict[str, str]:
    """Spark type name per stats column (``timestamp`` vs
    ``timestamp_ntz`` decides whether list-doc bounds are
    session-zoned), read off the stats frame's own schema."""
    by_name = {f.name: f.dataType.typeName() for f in stats.schema.fields}
    return {c: by_name[f"min_{c}"] for c in cols if f"min_{c}" in by_name}


def _with_groups(stats: DataFrame) -> DataFrame:
    tok, gdir = _group_cols(F.col("file"))
    return stats.withColumn("__g", tok).withColumn("__gdir", gdir)


def zonemap_stats(spark: SparkSession, data_dir: str, cols: list[str]) -> DataFrame:
    """Per-file stats frame for ``cols``: one row per parquet file with
    ``n_rows`` plus ``min_<c>``, ``max_<c>``, ``nulls_<c>`` per column,
    natively typed (dates stay dates, doubles stay doubles). Single
    partial/final aggregate onto #files keys — the only full-table
    pass zone maps ever make."""
    df = spark.read.parquet(data_dir)
    return (
        df.select(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.file_size").alias("__fsize"),
            *cols,
        )
        .groupBy("file")
        .agg(*_stat_aggs(cols))
    )


def _cover_empty_files(
    spark: SparkSession, data_dir: str, stats: DataFrame, candidates: list[str]
) -> DataFrame:
    """Union zero-row stats entries for candidate files the data scan
    produced no rows for — EMPTY parquet files (Spark writers can leave
    one for an all-empty task). They must appear in the manifest so its
    file count matches the live listing (the engine's stale-manifest
    guard compares the two before trusting the manifest), and a
    zero-row entry is pruned by every constraint (all-NULL min/max,
    zero null-count), so covering them never costs a read."""
    from quack_reduce_spark.lake import _fs_for

    statted = {_bare(r["file"]) for r in stats.select("file").collect()}
    missing = [p for p in candidates if _bare(p) not in statted]
    if not missing:
        return stats
    fs = _fs_for(data_dir)
    rows = []
    for f in missing:
        d: dict[str, Any] = {c: None for c in stats.columns}
        d["file"] = f
        d["n_rows"] = 0
        d["file_bytes"] = fs.size(f)
        for c in stats.columns:
            if c.startswith("nulls_"):
                d[c] = 0
        rows.append(tuple(d[c] for c in stats.columns))
    extra = spark.createDataFrame(rows, stats.schema)
    return stats.unionByName(extra)


def _write_grouped(
    spark: SparkSession, data_dir: str, stats_g: DataFrame, dynamic: bool
) -> None:
    """Write stats (carrying ``__g``/``__gdir``) as one manifest file
    per partition group under ``_zonemap/__g=<token>/``. ``__gdir`` is
    dropped (derivable; the list records it); ``__g`` becomes the
    physical partition dir. ``dynamic=True`` (the append path) uses
    DYNAMIC partition-overwrite: only the groups present in
    ``stats_g`` are replaced — the delta-only rewrite. ``dynamic=
    False`` (full rebuild) replaces the whole manifest dir so no
    stale group can linger."""
    zm = f"{data_dir.rstrip('/')}/{ZONEMAP_DIR}"
    # the overwrite mode rides on the WRITER, not the session conf:
    # a session-global toggle would leak into concurrent writes in
    # the same session and two racing append_zonemap calls could
    # clobber each other's restore
    (
        stats_g.drop("__gdir")
        .repartition("__g")
        .write.option("partitionOverwriteMode", "dynamic" if dynamic else "static")
        .partitionBy("__g")
        .mode("overwrite")
        .parquet(zm)
    )


def write_zonemap(spark: SparkSession, data_dir: str, cols: list[str]) -> int:
    """Build and persist the grouped manifest at ``<data_dir>/_zonemap``
    (one manifest per data directory + ``_list.json``). Returns the
    number of data files covered. Rebuild after any rewrite of the
    table; the versioned-lake integration gets this for free because
    version directories are immutable (stats written once per version
    can never go stale)."""
    stats = _cover_empty_files(
        spark, data_dir, zonemap_stats(spark, data_dir, cols), _data_files(data_dir)
    )
    stats_g = _with_groups(stats).localCheckpoint()
    _write_grouped(spark, data_dir, stats_g, dynamic=False)
    groups = _group_summaries(stats_g, cols)
    _write_list(
        data_dir, cols, groups,
        tz=spark.conf.get("spark.sql.session.timeZone"),
        types=_stat_types(stats_g, cols),
    )
    return sum(g["n_files"] for g in groups.values())


def read_zonemap(spark: SparkSession, data_dir: str) -> DataFrame:
    """All per-file stats rows (every group's manifest; legacy
    single-file layouts read identically — ``_list.json`` is
    underscore-hidden from the parquet scan)."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{data_dir.rstrip('/')}/{ZONEMAP_DIR}")
    )


def has_zonemap(data_dir: str) -> bool:
    from quack_reduce_spark.lake import _fs_for, _join

    return _fs_for(data_dir).is_dir(_join(data_dir, ZONEMAP_DIR))


def zonemap_cols(data_dir: str) -> list[str]:
    """The stats columns the manifest covers (from the manifest list;
    legacy manifests fall back to parsing ``min_<c>`` field names on
    first use via :func:`_upgrade_legacy` callers)."""
    doc = _read_list(data_dir)
    if doc is not None:
        return list(doc["cols"])
    return []


def _data_files(data_dir: str) -> list[str]:
    """Recursive parquet-file listing under ``data_dir`` (hive
    partition subdirs included), skipping hidden ``_``/``.`` names —
    the same visibility rule Spark's file index applies. Goes through
    the lake's filesystem dispatch, so URI paths (s3a/hdfs/file:) walk
    the Hadoop FileSystem like every other metadata op."""
    from quack_reduce_spark.lake import _fs_for, _join

    fs = _fs_for(data_dir)
    out: list[str] = []
    stack = [data_dir.rstrip("/")]
    while stack:
        d = stack.pop()
        for name in fs.list_names(d):
            if name.startswith(("_", ".")):
                continue
            p = _join(d, name)
            if fs.is_dir(p):
                stack.append(p)
            elif name.endswith(".parquet"):
                out.append(p)
    return out


def _upgrade_legacy(spark: SparkSession, data_dir: str) -> list[str]:
    """Rewrite a round-9 single-file manifest into the grouped layout
    — from the manifest's OWN rows (no table rescan). Returns the
    stats columns. Idempotent: grouped layouts pass through."""
    doc = _read_list(data_dir)
    if doc is not None:
        return list(doc["cols"])
    old = read_zonemap(spark, data_dir)
    cols = [c[len("min_"):] for c in old.columns if c.startswith("min_")]
    if "file_bytes" not in old.columns:  # r9 manifests predate sizes
        old = old.withColumn("file_bytes", F.lit(None).cast("long"))
    stats_g = _with_groups(old).localCheckpoint()
    _write_grouped(spark, data_dir, stats_g, dynamic=False)
    _write_list(
        data_dir, cols, _group_summaries(stats_g, cols),
        tz=spark.conf.get("spark.sql.session.timeZone"),
        types=_stat_types(stats_g, cols),
    )
    return cols


def append_zonemap(
    spark: SparkSession,
    data_dir: str,
    cols: list[str],
    new_files: list[str] | None = None,
) -> int:
    """Incremental manifest maintenance after an APPEND: stat only the
    files not yet covered (read directly by path — the existing
    files' rows are never rescanned) and rewrite ONLY the touched
    partition groups' manifests (dynamic partition overwrite) plus
    their manifest-list entries. Untouched groups are never read or
    rewritten, so maintenance cost tracks the DELTA even on
    million-file tables. Returns the number of NEW files statted.

    ``new_files``: when the appender knows its delta (a streaming
    sink's batch output, a lake commit's added files), pass it to skip
    the directory walk entirely — the Iceberg append-commit shape,
    where the commit carries its own file list. Without it the delta
    is discovered by walking the data directory and diffing against
    the touched groups' manifests only."""
    known_cols = _upgrade_legacy(spark, data_dir)
    if known_cols and list(cols) != known_cols:
        raise ValueError(f"manifest covers {known_cols}, asked to append {list(cols)}")
    doc = _read_list(data_dir)
    # cached docs are shared read-only objects: copy before updating
    # entries (only whole-entry replacement below, shallow is enough)
    groups: dict[str, dict] = dict(doc["groups"]) if doc else {}

    if new_files is None:
        candidates = _data_files(data_dir)
    else:
        candidates = list(new_files)
    # group the candidate files, then narrow to groups that can have
    # gained files: a known group whose on-disk file count equals its
    # manifest-list n_files has nothing new (appends only ADD files —
    # the documented contract; rewrites require write_zonemap), so its
    # manifest is never read. Only suspect groups are opened + diffed.
    by_tok: dict[str, list[str]] = {}
    for p in candidates:
        by_tok.setdefault(_token(_dirname(_bare(p))), []).append(p)
    if new_files is None:
        suspect = [
            t
            for t, paths in by_tok.items()
            if t not in groups or len(paths) != groups[t]["n_files"]
        ]
    else:
        suspect = list(by_tok)  # caller says these are the delta
    zm = f"{data_dir.rstrip('/')}/{ZONEMAP_DIR}"
    touched_known = [t for t in suspect if t in groups]
    known: set[str] = set()
    old_touched = None
    if touched_known:
        old_touched = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(*[f"{zm}/__g={t}" for t in touched_known])
        )
        known = {_bare(r["file"]) for r in old_touched.select("file").collect()}
    fresh_files = [
        p
        for t in suspect
        for p in by_tok[t]
        if _bare(p) not in known
    ]
    if not fresh_files:
        return 0
    # basePath keeps hive partition columns resolvable when reading
    # explicit file paths, so partition columns remain valid stats_cols
    df = spark.read.option("basePath", data_dir).parquet(*fresh_files)
    fresh = (
        df.select(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.file_size").alias("__fsize"),
            *cols,
        )
        .groupBy("file")
        .agg(*_stat_aggs(cols))
    )
    fresh = _cover_empty_files(spark, data_dir, fresh, fresh_files)
    fresh_g = _with_groups(fresh)
    # merge back ONLY the old rows of groups that actually gained
    # files — anything else would dynamic-overwrite (hence rewrite)
    # untouched partitions' manifests
    fresh_toks = {_token(_dirname(_bare(p))) for p in fresh_files}
    if old_touched is not None:
        if "file_bytes" not in old_touched.columns:  # r10 manifests
            old_touched = old_touched.withColumn(
                "file_bytes", F.lit(None).cast("long")
            )
        old_g = _with_groups(old_touched).filter(
            F.col("__g").isin(*fresh_toks)
        )
        merged = old_g.unionByName(fresh_g)
    else:
        merged = fresh_g
    # localCheckpoint pins the touched groups' old rows in memory so
    # the dynamic overwrite cannot clobber the frame mid-read
    merged = merged.localCheckpoint()
    _write_grouped(spark, data_dir, merged, dynamic=True)
    for tok, entry in _group_summaries(merged, cols).items():
        groups[tok] = entry
    # untouched groups keep the bounds the ORIGINAL session rendered:
    # if this session's timezone differs from the doc's, the merged
    # doc would mix renderings — record no tz, so session-zoned
    # timestamp bounds decode as unknown (groups kept, sound) until
    # the next full write_zonemap re-renders them consistently
    cur_tz = spark.conf.get("spark.sql.session.timeZone")
    doc_tz = doc.get("tz") if doc else cur_tz
    _write_list(
        data_dir, cols, groups,
        tz=cur_tz if doc_tz == cur_tz else None,
        types=(doc or {}).get("types") or _stat_types(merged, cols),
    )
    return len(fresh_files)


# -- pruning ---------------------------------------------------------------


def _intersects(glo, ghi, lo, hi) -> bool:
    """Can [glo, ghi] intersect [lo, hi]? An all-NULL group (both
    bounds None) cannot match a range predicate; an _UNKNOWN bound
    (unencodable type / untrusted timestamp rendering) keeps the
    group — pruning degrades to reading, never to a wrong answer."""
    if glo is _UNKNOWN or ghi is _UNKNOWN:
        return True
    if glo is None and ghi is None:
        return False  # group is all NULL for this column
    try:
        if lo is not None and ghi is not None and ghi < lo:
            return False
        if hi is not None and glo is not None and glo > hi:
            return False
    except TypeError:
        return True  # incomparable types: keep the group (sound)
    return True


def _group_rows(
    spark: SparkSession, data_dir: str, toks: list[str], epoch: tuple
) -> list[dict]:
    """Per-file stats rows of the given partition groups, as plain
    dicts, served from the cache while ``epoch`` (list mtime +
    session timezone — collect renders timestamps session-locally)
    matches. A cache miss reads ONLY the missed groups' manifests."""
    out: list[dict] = []
    missed: list[str] = []
    for t in toks:
        hit = _GROUP_CACHE.get((data_dir, t))
        if hit is not None and hit[0] == epoch:
            out.extend(hit[1])
        else:
            missed.append(t)
    if missed:
        IO_COUNTS["group_reads"] += 1
        zmdir = f"{data_dir.rstrip('/')}/{ZONEMAP_DIR}"
        zm = spark.read.option("recursiveFileLookup", "true").parquet(
            *[f"{zmdir}/__g={t}" for t in missed]
        )
        tok_col, _ = _group_cols(F.col("file"))
        rows = [r.asDict() for r in zm.withColumn("__tok", tok_col).collect()]
        by_tok: dict[str, list[dict]] = {t: [] for t in missed}
        for r in rows:
            by_tok.setdefault(r.pop("__tok"), []).append(r)
        for t, rs in by_tok.items():
            _GROUP_CACHE[(data_dir, t)] = (epoch, rs)
            out.extend(rs)
    return out


def _file_matches(row: dict, constraints: dict[str, tuple]) -> bool:
    """Python twin of the manifest range filter: the file survives iff
    EVERY constrained column's stats can hold a matching row. A
    ``(lo, hi, vals, nullness)`` constraint checks, in order: IS NULL
    needs the file to CONTAIN nulls (null-count > 0); everything else
    (ranges, IN value sets, IS NOT NULL) cannot match an all-NULL file
    (NULL min/max); then the [min, max] interval must intersect the
    range / hold some IN value. Incomparable values keep the file
    (sound); a missing null-count stat keeps the file too."""
    for col, constraint in constraints.items():
        lo, hi, vals = constraint[0], constraint[1], constraint[2]
        nullness = constraint[3] if len(constraint) > 3 else None
        mn, mx = row.get(f"min_{col}"), row.get(f"max_{col}")
        if nullness == "null":
            nulls = row.get(f"nulls_{col}")
            if nulls == 0:
                return False  # no NULLs in this file: IS NULL can't match
            continue
        if mn is None and mx is None:
            return False
        try:
            if vals is not None:
                if not any(mn <= v <= mx for v in vals):
                    return False
                continue
            if lo is not None and mx < lo:
                return False
            if hi is not None and mn > hi:
                return False
        except TypeError:
            continue  # incomparable: keep the file
    return True


def prune_files_multi(
    spark: SparkSession,
    data_dir: str,
    constraints: dict[str, tuple],
) -> tuple[list[dict], int]:
    """Surviving per-file stats rows (dicts with ``file``, ``n_rows``,
    ``file_bytes`` when recorded, and the min/max columns) for a
    CONJUNCTION of per-column constraints
    ``{col: (lo, hi, vals, nullness)}`` — ``vals`` (an IN-list's value
    set, or None) beats lo/hi when present; ``nullness`` is
    ``'null'``/``'notnull'``/None (IS NULL prunes by the per-file
    null COUNT — files with zero nulls can't match — and is the one
    constraint an all-NULL file survives). Returns
    ``(rows, total_file_count)``.

    Planning is manifest-list-first: groups whose group-level bounds
    cannot intersect ANY constraint are skipped without reading their
    manifests; surviving groups' rows come from the parsed-manifest
    cache (keyed on the manifest list's mtime — the commit point every
    manifest mutation rewrites last), so repeated queries on an
    unchanged table do ZERO manifest I/O and zero Spark jobs: the
    per-file filter runs driver-side over cached dicts (planning
    metadata, #files-scale — the cost every table format pays)."""
    doc, mt = _read_list_cached(data_dir)
    session_tz = spark.conf.get("spark.sql.session.timeZone")
    if doc is None:
        zm = read_zonemap(spark, data_dir)  # legacy layout: uncached
        IO_COUNTS["group_reads"] += 1
        rows = [r.asDict() for r in zm.collect()]
        total = len(rows)
    else:
        groups = doc["groups"]
        doc_tz = doc.get("tz")
        types = doc.get("types") or {}
        total = sum(g["n_files"] for g in groups.values())
        live = []
        for tok, g in groups.items():
            ok = True
            for col, constraint in constraints.items():
                lo, hi, vals = constraint[0], constraint[1], constraint[2]
                if lo is None and hi is None and vals is None:
                    continue  # nullness-only: no group-level stat to prune on
                st = g["stats"].get(col)
                if st is None:
                    continue  # column not list-covered: can't prune on it
                glo = _dec(st["lo"], doc_tz, session_tz, types.get(col))
                ghi = _dec(st["hi"], doc_tz, session_tz, types.get(col))
                if vals is not None:
                    if not any(_intersects(glo, ghi, v, v) for v in vals):
                        ok = False
                        break
                elif not _intersects(glo, ghi, lo, hi):
                    ok = False
                    break
            if ok:
                live.append(tok)
        if not live:
            return [], total
        rows = _group_rows(spark, data_dir, live, (mt, session_tz))
    return [r for r in rows if _file_matches(r, constraints)], total


def manifest_stats(spark: SparkSession, data_dir: str) -> dict:
    """Table-level statistics straight from the manifest — the
    ANALYZE readout a CBO wants, at metadata cost (cached group rows,
    zero data scanned): total rows, file count, total file bytes
    (None when any file predates size recording), and per stats
    column {min, max, nulls}. EXACT (not estimates) whenever the
    manifest is current — zone-map stats are computed from every row
    at build/append time; callers that must defend against a stale
    manifest compare ``n_files`` against a live listing (the engine's
    pushdown does exactly that before trusting pruning)."""
    doc, mt = _read_list_cached(data_dir)
    session_tz = spark.conf.get("spark.sql.session.timeZone")
    if doc is None:
        rows = [r.asDict() for r in read_zonemap(spark, data_dir).collect()]
        cols = sorted(
            c[len("min_"):] for c in (rows[0] if rows else {}) if c.startswith("min_")
        )
    else:
        rows = _group_rows(
            spark, data_dir, list(doc["groups"]), (mt, session_tz)
        )
        cols = list(doc["cols"])
    sizes = [r.get("file_bytes") for r in rows]
    out: dict = {
        "n_files": len(rows),
        "n_rows": sum(int(r["n_rows"]) for r in rows),
        "total_bytes": (
            sum(int(s) for s in sizes) if rows and all(s is not None for s in sizes) else None
        ),
        "columns": {},
    }
    for c in cols:
        mins = [r[f"min_{c}"] for r in rows if r.get(f"min_{c}") is not None]
        maxs = [r[f"max_{c}"] for r in rows if r.get(f"max_{c}") is not None]
        out["columns"][c] = {
            "min": min(mins) if mins else None,
            "max": max(maxs) if maxs else None,
            "nulls": sum(int(r.get(f"nulls_{c}", 0)) for r in rows),
        }
    return out


def prune_files(
    spark: SparkSession,
    data_dir: str,
    col: str,
    lo=None,
    hi=None,
) -> tuple[list[str], int]:
    """File paths whose ``[min_col, max_col]`` interval can intersect
    the closed interval ``[lo, hi]`` (either bound may be None for a
    one-sided range), plus the total file count — the single-column
    range form of :func:`prune_files_multi`."""
    rows, total = prune_files_multi(spark, data_dir, {col: (lo, hi, None, None)})
    return [r["file"] for r in rows], total


def scan_pruned(
    spark: SparkSession,
    data_dir: str,
    col: str,
    lo=None,
    hi=None,
) -> tuple[DataFrame, int, int]:
    """Range scan with manifest-level file skipping: returns
    ``(frame, files_read, files_total)`` where ``frame`` is exactly
    ``read(data_dir).filter(lo <= col <= hi)`` — the predicate is
    re-applied to surviving files, so zone-map granularity can only
    cost reads, never correctness."""
    files, total = prune_files(spark, data_dir, col, lo, hi)
    if files:
        # basePath keeps hive partition columns resolvable when the
        # survivors are read by explicit path
        df = spark.read.option("basePath", data_dir).parquet(*files)
    else:
        df = spark.read.parquet(data_dir).limit(0)
    pred = F.col(col).isNotNull()
    if lo is not None:
        pred = pred & (F.col(col) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(col) <= F.lit(hi))
    return df.filter(pred), len(files), total
