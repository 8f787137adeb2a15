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

import bisect
import datetime as _dt
import decimal as _decimal
import hashlib
import json
import re as _re
import uuid
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

ZONEMAP_DIR = "_zonemap"
LIST_FILE = "_list.json"
# per-file per-group partials (see the GROUP STATS section below)
GROUP_STATS_DIR = "_zonemap_groups"
GROUP_STATS_MAX_PER_FILE = 64
GROUP_STATS_READ_MAX = 262_144


# -- path normalization (Spark reports file:/ URIs; fs walks report bare) --


def _bare(p: str) -> str:
    """Scheme-less path: ``file:///x`` / ``file:/x`` / ``/x`` → ``/x``."""
    return "/" + p.split("://")[-1].removeprefix("file:").lstrip("/")


def _bare_col(c: Column) -> Column:
    return F.regexp_replace(c, "^[a-zA-Z0-9]+:/+", "/")


def _file_col() -> Column:
    """``_metadata.file_path`` URI-DECODED to the filesystem listing's
    form. Path URIs percent-encode special characters — a partition
    value holding a space renders ``%20`` — while directory listings
    return literal names; every manifest ``file`` value, group token,
    and listing comparison must live in ONE form or a space-bearing
    layout gets spurious "missing" rows (duplicate manifest entries)
    and mismatched group tokens on append. ``+`` is URI-path-legal
    (never encoded by Path.toUri), so it is masked to ``%2B`` before
    ``url_decode``'s form-decoding would turn it into a space; every
    literal ``%`` in a real path arrives pre-encoded as ``%25``, so
    the decode cannot see a malformed escape."""
    return F.url_decode(
        F.regexp_replace(F.col("_metadata.file_path"), "[+]", "%2B")
    )


def _unq(p: str) -> str:
    """Driver-side twin of :func:`_file_col` for values read back from
    PRE-EXISTING manifests (which may hold URI-encoded paths)."""
    from urllib.parse import unquote

    return unquote(p)


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
# a legacy timestamp bound whose rendering is untrustworthy): the group
# must be KEPT — distinct from None, which means "all NULL" and is
# safely prunable under a range predicate.
_UNKNOWN = object()

# Session-zoned TIMESTAMP stats live in EPOCH-MICROS space end to end
# (manifest version 3): the stats build stores min/max as
# ``unix_micros`` longs, the list doc serializes them as plain ints,
# and the SQL pushdown keeps Catalyst timestamp literals as their raw
# internal micros — NO rendering ever happens, so no timezone (session
# OR driver-OS — PySpark's ``TimestampType.fromInternal`` renders
# ``collect()`` values in the OS zone, NOT the session zone, which is
# why any datetime-rendered comparison was unsound off-UTC hosts) can
# shift a bound. ``timestamp_ntz`` values are wall-clock and
# zone-free in both directions; they stay native datetimes.
_EPOCH_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_US = _dt.timedelta(microseconds=1)


def _ts_render(micros: int) -> _dt.datetime:
    """OS-local naive rendering of epoch micros — the exact twin of
    PySpark's ``TimestampType.fromInternal`` (what a ``collect()`` of
    the same column would have produced), used only at the DISPLAY
    layer (:func:`manifest_stats`), never for pruning comparisons."""
    return _dt.datetime.fromtimestamp(micros // 1_000_000).replace(
        microsecond=micros % 1_000_000
    )


def _to_micros(v: Any, session_tz: str) -> Any:
    """Epoch micros of a caller-supplied bound for an epoch-space
    timestamp column: ints pass through (already micros), aware
    datetimes convert exactly, naive datetimes are interpreted in the
    SESSION zone (the semantics a SQL timestamp literal has). Exact
    integer arithmetic — no float epoch. Unconvertible values return
    unchanged (comparisons then TypeError and keep the file: sound)."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            try:
                from zoneinfo import ZoneInfo

                v = v.replace(tzinfo=ZoneInfo(session_tz))
            except Exception:
                return v
        return (v - _EPOCH_UTC) // _US
    return v


def _enc(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"t": "date", "v": v.isoformat()}
    if isinstance(v, (int, float, str, bool)):
        return {"t": type(v).__name__, "v": v}
    if isinstance(v, _decimal.Decimal):
        # WIDE decimals (p > 18: no unscaled-long space) stat natively
        # and serialize as their exact decimal string — JSON-safe,
        # lossless both ways (r14)
        return {"t": "dec", "v": str(v)}
    # unencodable type (bytes, intervals, ...): record as unknown — the
    # group can then never be list-pruned (sound: pruning degrades to
    # reading its manifest, never to a wrong answer)
    return {"t": "?", "v": None}


# -- decimal stats: UNSCALED-INT space (the epoch-micros pattern) -----------
#
# Real lakes keep prices/amounts as decimals, and a decimal-keyed range
# scan that silently gets zero file skipping is a planning hole. A
# ``decimal(p,s)`` column with p <= 18 stats as the EXACT long
# ``v * 10^s`` end to end: min/max commute with the positive monotone
# scaling, JSON holds exact ints, every pruning comparison is
# int-vs-int, and Catalyst decimal literals decode to the same space
# via ``toUnscaledLong`` (binary comparisons against a BARE attribute
# are same-typed post-analysis, so the literal's scale is the
# column's). p > 18 keeps the old native passthrough (driver-side
# Decimal comparisons; no SQL-literal pruning — sound, just slower).

_DEC_MAX_PRECISION = 18
_DEC_RE = _re.compile(r"decimal\((\d+),(\d+)\)$")


def _decimal_ps(tname: Any) -> tuple[int, int] | None:
    m = _DEC_RE.match(tname) if isinstance(tname, str) else None
    return (int(m.group(1)), int(m.group(2))) if m else None


def _unscaled_decimal(tname: Any) -> int | None:
    """Scale ``s`` when ``tname`` names an unscaled-space decimal stats
    column (p <= 18), else None."""
    ps = _decimal_ps(tname)
    if ps is None or ps[0] > _DEC_MAX_PRECISION:
        return None
    return ps[1]


def _unscaled_col(c: str, s: int) -> Column:
    # exact: v*10^s is integral with <= 18 digits (inside long range);
    # the decimal multiply is exact arithmetic at result scale s, and
    # the ANSI cast of that integral value to long cannot overflow
    return (F.col(c) * F.lit(10 ** s).cast(f"decimal({s + 1},0)")).cast("long")


def _to_unscaled_bound(v: Any, s: int, ceil: bool) -> Any:
    """Unscaled-int reformulation of a caller-supplied bound on a
    scale-``s`` decimal column. Ints pass through (already unscaled —
    the SQL pushdown supplies those, the _to_micros discipline);
    Decimal/float/str values scale exactly, with a non-representable
    remainder absorbed by ceiling (lo bounds) / floor (hi bounds) —
    an EXACT reformulation over scale-s values, not a widening.
    Unconvertible values return unchanged (comparisons then TypeError
    and keep the file: sound)."""
    if isinstance(v, bool) or isinstance(v, int):
        return v
    try:
        d = _decimal.Decimal(str(v)).scaleb(s)
    except Exception:
        return v
    rounding = _decimal.ROUND_CEILING if ceil else _decimal.ROUND_FLOOR
    return int(d.to_integral_value(rounding=rounding))


def _to_unscaled_val(v: Any, s: int) -> Any:
    """Unscaled int of an IN-list value, None when the value is not
    representable at scale s (it then matches NO row — dropping it is
    exact, not a widening). Ints pass through."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    try:
        d = _decimal.Decimal(str(v)).scaleb(s)
    except Exception:
        return None
    if d != d.to_integral_value():
        return None
    return int(d)


def _py_field_types(df: DataFrame) -> dict[str, str]:
    """Column -> type name off a PYTHON schema, with decimals
    parametrized (PySpark's ``typeName()`` drops precision/scale; the
    JVM's keeps them — this normalizes to the JVM form every reader
    keys on)."""
    out: dict[str, str] = {}
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t == "decimal":
            t = f"decimal({f.dataType.precision},{f.dataType.scale})"
        out[f.name] = t
    return out


def _dec(e: Any, col_type: str | None = None) -> Any:
    """Decode a list-doc bound. Version-3 docs store session-zoned
    timestamp bounds as epoch-micros ints (``{"t": "int"}``) — no
    rendering to decode. A ``{"t": "ts"}`` bound on a session-zoned
    column is a LEGACY doc whose serialized rendering went through
    PySpark collect (driver-OS zone, unrecorded and untrustworthy):
    it decodes to ``_UNKNOWN`` — the group is kept rather than
    mis-pruned — until the next full write_zonemap rebuilds in epoch
    space. NTZ bounds are wall-clock and decode exactly."""
    if e is None:
        return None
    if e.get("t") == "?":
        return _UNKNOWN
    t, v = e["t"], e["v"]
    if t == "ts":
        if col_type == "timestamp":
            return _UNKNOWN  # legacy OS-rendered bound: untrusted
        return _dt.datetime.fromisoformat(v)
    if t == "date":
        return _dt.date.fromisoformat(v)
    if t == "dec":
        return _decimal.Decimal(v)
    return v


def _list_path(data_dir: str) -> str:
    return f"{data_dir.rstrip('/')}/{ZONEMAP_DIR}/{LIST_FILE}"


# Parsed-manifest caches, keyed on the manifest list's (mtime, size)
# stat pair: every manifest mutation (write_zonemap, append_zonemap,
# legacy upgrade) commits by rewriting _list.json LAST, so its stat is
# the cache epoch for the whole _zonemap tree. mtime alone is
# millisecond-granular (coarser on some stores) — two commits in one
# tick could serve a stale parse — so size joins the key, every doc
# carries a per-commit uuid token (the GROUP cache epoch, exact once
# the list parse is fresh), and _write_list bumps mtime monotonically
# when a rewrite lands inside the previous tick. Entries are only ever
# replaced with a fresh parse of the same path (GIL-atomic dict ops; a
# racing reader at worst re-reads). IO_COUNTS tracks ACTUAL reads so
# tests can assert that N queries on an unchanged table hit disk once.
_LIST_CACHE: dict[str, tuple[tuple, dict]] = {}
_GROUP_CACHE: dict[tuple[str, str], tuple[Any, list[dict]]] = {}
IO_COUNTS = {"list_reads": 0, "group_reads": 0}


def _read_list(data_dir: str) -> dict | None:
    """Parsed manifest list (cached). The returned dict is the SHARED
    cache object — callers must treat it as immutable."""
    doc, _ = _read_list_cached(data_dir)
    return doc


def _read_list_cached(data_dir: str) -> tuple[dict | None, Any]:
    """(parsed manifest list, its cache epoch) — served from the cache
    while the file's (mtime, size) stat is unchanged. The epoch is the
    doc's own commit token when present (exact across same-tick
    rewrites), else the stat pair."""
    from quack_reduce_spark.lake import _fs_for

    fs = _fs_for(data_dir)
    p = _list_path(data_dir)
    key = fs.stat_key(p)
    if key is None:
        _LIST_CACHE.pop(data_dir, None)
        return None, None
    hit = _LIST_CACHE.get(data_dir)
    if hit is not None and hit[0] == key:
        doc = hit[1]
    else:
        IO_COUNTS["list_reads"] += 1
        doc = json.loads(fs.read_text(p))
        _LIST_CACHE[data_dir] = (key, doc)
    return doc, doc.get("commit", key)


def _invalidate_cache(data_dir: str) -> None:
    _LIST_CACHE.pop(data_dir, None)
    for key in [k for k in _GROUP_CACHE if k[0] == data_dir]:
        _GROUP_CACHE.pop(key, None)
    for key in [k for k in _GSTATS_CACHE if k[0] == data_dir]:
        _GSTATS_CACHE.pop(key, None)


def _write_list(
    data_dir: str,
    cols: list[str],
    groups: dict[str, dict],
    types: dict[str, str] | None = None,
    bloom: dict[str, dict] | None = None,
    hist: dict[str, dict] | None = None,
    ndv: dict[str, dict] | None = None,
    group_stats: dict[str, dict] | None = None,
) -> None:
    """Commit the manifest list. Version 3: session-zoned timestamp
    bounds are epoch-micros ints (``types`` records the SOURCE column
    types so readers know which ints are micros); ``commit`` is a
    per-write uuid — the exact group-cache epoch. After the atomic
    replace, mtime is bumped monotonically past the previous doc's so
    two same-tick commits can never alias in the stat-keyed cache."""
    from quack_reduce_spark.lake import _fs_for

    doc: dict[str, Any] = {
        "version": 3,
        "cols": cols,
        "groups": groups,
        "commit": uuid.uuid4().hex,
    }
    if types:
        doc["types"] = types
    if bloom:
        doc["bloom"] = bloom
    if hist:
        doc["hist"] = hist
    if ndv:
        doc["ndv"] = ndv
    if group_stats:
        doc["group_stats"] = group_stats
    fs = _fs_for(data_dir)
    p = _list_path(data_dir)
    prev = fs.mtime(p)
    fs.write_text_atomic(p, json.dumps(doc, indent=1))
    if prev is not None:
        now = fs.mtime(p)
        if now is not None and now <= prev:
            try:
                fs.set_mtime(p, prev + 0.001)
            except Exception:
                pass  # stat-pair + commit token still disambiguate
    _invalidate_cache(data_dir)


def _group_summaries(stats_g: DataFrame, cols: list[str]) -> dict[str, dict]:
    """Manifest-list entries from a stats frame that carries ``__g``
    (token) and ``__gdir`` columns: per group — dir, file count, and
    group-level [lo, hi] per stats column. One aggregate onto
    #partitions rows; the only driver materialization in the build."""
    aggs = [
        F.first("__gdir").alias("dir"),
        F.count(F.lit(1)).alias("n_files"),
        # group-level row count in the LIST doc: table row count (the
        # histogram drift trigger, CBO sizing) then needs zero group
        # manifest reads
        F.sum("n_rows").alias("__nr"),
    ]
    for c in cols:
        aggs.append(F.min(f"min_{c}").alias(f"lo_{c}"))
        aggs.append(F.max(f"max_{c}").alias(f"hi_{c}"))
    out: dict[str, dict] = {}
    for r in stats_g.groupBy("__g").agg(*aggs).collect():
        out[r["__g"]] = {
            "dir": r["dir"],
            "n_files": int(r["n_files"]),
            "n_rows": int(r["__nr"] or 0),
            "stats": {
                c: {"lo": _enc(r[f"lo_{c}"]), "hi": _enc(r[f"hi_{c}"])} for c in cols
            },
        }
    return out


# -- per-file Bloom fingerprints (point-lookup skipping) --------------------
#
# Min/max envelopes are a LAYOUT property: on a column the table is not
# clustered by, every file's interval spans the whole domain and a
# point lookup (`WHERE id = X`, `id IN (...)`) reads everything. Real
# formats fix this with per-file membership fingerprints (Parquet
# column bloom filters, Iceberg puffin blobs): a compact bitset per
# file that answers "can this file contain value v?" with no false
# negatives. This section hoists that into the manifest: a dense
# 62-bit-word Bloom bitset per (file, column), built with the SAME
# enhanced-double-hashing positions operators/sketches.py uses (one
# md5 per value), probed DRIVER-SIDE at plan time — hashlib.md5 of the
# value's string rendering reproduces Spark's ``md5(cast(c as
# string))`` exactly, so no Spark job runs to plan. Equality and
# IN-list constraints then prune files on ANY layout; join-derived DPP
# key sets get the same treatment for free, which is what makes a
# star lookup on an unclustered fact skip files.

# column types whose Spark cast-to-string rendering is reproduced
# bit-exactly by Python str(): integer-family digits and raw strings.
# (floats/dates/timestamps render differently engine-to-engine and a
# mismatch would be an UNSOUND false negative, so they are refused.)
_BLOOM_TYPES = {"integer", "long", "short", "byte", "string"}
BLOOM_BPK = 10  # bits per key: ~0.9% fp at k=5
BLOOM_K = 5


def _bloom_positions_py(v: Any, m: int, k: int) -> list[int] | None:
    """Driver-side twin of ``sketches.bloom_positions(cast(c as
    string))``: one md5 of the value's UTF-8 string rendering, h1/h2
    from the two leading 32-bit digest halves (h2 forced odd), probes
    ``(h1 + i*h2 + (i^3-i)/6) mod m``. Returns None for values whose
    Python rendering is not guaranteed to match Spark's (the caller
    must then skip the bloom test — sound)."""
    if isinstance(v, bool) or not isinstance(v, (int, str)):
        return None
    d = hashlib.md5(str(v).encode("utf-8")).hexdigest()
    h1 = int(d[0:8], 16)
    h2 = int(d[8:16], 16) | 1
    return [(h1 + i * h2 + (i * i * i - i) // 6) % m for i in range(k)]


def _bloom_word_frame(df: DataFrame, c: str, m: int, k: int) -> DataFrame:
    """``(file, bloom_<c>)``: per-file DENSE Bloom bitset of column
    ``c`` as ``array<long>`` of ``m/62`` words — one extra distributed
    pass over the table (explode k positions per row, two
    map-side-combinable aggregates onto #files keys). NULLs never set
    bits (an equality can't match NULL)."""
    from quack_reduce_spark.operators.sketches import (
        BLOOM_WORD_BITS,
        _bit_of,
        bloom_positions,
    )

    words_n = m // BLOOM_WORD_BITS
    # decimal columns fingerprint their UNSCALED-long rendering — the
    # same space their manifest stats and the driver-side probe use
    s = _unscaled_decimal(_py_field_types(df).get(c))
    src = _unscaled_col(c, s) if s is not None else F.col(c)
    pos = (
        df.select(
            _file_col().alias("file"),
            src.cast("string").alias("__v"),
        )
        .where(F.col("__v").isNotNull())
        .select(
            "file",
            F.explode(
                F.array(*bloom_positions(F.col("__v"), m=m, k=k))
            ).alias("p"),
        )
    )
    sparse = pos.groupBy(
        "file", F.floor(F.col("p") / BLOOM_WORD_BITS).cast("long").alias("wi")
    ).agg(F.bit_or(_bit_of(F.col("p"))).alias("w"))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(words_n - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__bm"), i.cast("long")), F.lit(0).cast("long")
        ),
    )
    return sparse.groupBy("file").agg(
        F.map_from_entries(F.collect_list(F.struct("wi", "w"))).alias("__bm")
    ).select("file", dense.alias(f"bloom_{c}"))


def _bloom_m_for(max_rows: int, bpk: int) -> int:
    from quack_reduce_spark.operators.sketches import BLOOM_WORD_BITS

    words = max(1, (max(1, int(max_rows)) * bpk + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS)
    return words * BLOOM_WORD_BITS


def _validate_bloom_cols(
    types: dict[str, str], cols: list[str], bloom_cols: list[str]
) -> None:
    for c in bloom_cols:
        if c not in cols:
            raise ValueError(
                f"bloom column {c!r} must also be a stats column (have {cols})"
            )
        if (
            types.get(c) not in _BLOOM_TYPES
            and _unscaled_decimal(types.get(c)) is None
        ):
            # decimal(p<=18) qualifies: its stats space is the unscaled
            # LONG, whose str() rendering is exactly Spark's
            # cast-long-to-string — both build and probe use that space
            raise ValueError(
                f"bloom fingerprints support {sorted(_BLOOM_TYPES)} and "
                f"decimal(p<=18) columns; {c!r} is {types.get(c)!r} (its "
                f"string rendering is not portable between the build and "
                f"the driver-side probe)"
            )


def _attach_blooms(
    df: DataFrame, stats: DataFrame, bloom_doc: dict[str, dict]
) -> DataFrame:
    """Left-join each bloom column's per-file word arrays onto the
    stats frame (files the data scan never saw — empty parquet parts —
    keep a NULL bitset, which the probe treats as 'no fingerprint:
    keep the file')."""
    for c, cfg in bloom_doc.items():
        stats = stats.join(
            _bloom_word_frame(df, c, int(cfg["m"]), int(cfg["k"])), "file", "left"
        )
    return stats


def _bloom_any(
    row: dict,
    col: str,
    vals: Any,
    mn: Any,
    mx: Any,
    cfg: dict,
    memo: dict,
) -> bool:
    """Can SOME candidate value be in this file, per its Bloom
    fingerprint? Probes only values inside the file's [mn, mx] when
    the set is sorted; positions are memoized per value across files
    (the md5 depends only on the value). A file with no stored bitset
    (pre-fingerprint or empty) is kept. No false negatives: every
    present value's bits were set by the build pass."""
    from quack_reduce_spark.operators.sketches import BLOOM_WORD_BITS

    bm = row.get(f"bloom_{col}")
    if bm is None:
        return True
    m, k = int(cfg["m"]), int(cfg["k"])
    it = vals
    if isinstance(vals, tuple):
        i = 0 if mn is None else bisect.bisect_left(vals, mn)
        j = len(vals) if mx is None else bisect.bisect_right(vals, mx)
        it = vals[i:j]
    n_words = len(bm)
    for v in it:
        pos = memo.get((col, v))
        if pos is None:
            pos = _bloom_positions_py(v, m, k)
            if pos is None:
                return True  # unportable rendering: no test (sound)
            memo[(col, v)] = pos
        hit = True
        for p in pos:
            wi = p // BLOOM_WORD_BITS
            if wi >= n_words:
                return True  # bitset/doc width drift: keep (sound)
            if not (bm[wi] >> (p % BLOOM_WORD_BITS)) & 1:
                hit = False
                break
        if hit:
            return True
    return False


# -- per-file HLL register sketches (metadata-cost NDV) ---------------------
#
# Join-cardinality estimation needs DISTINCT counts (est_join_rows ~
# |L| * |R| / max(ndv_L, ndv_R)), which neither min/max nor row counts
# give. A per-file HLL register set (p=8, 256 registers — the same
# portable register math operators/sketches.py hash-proves against a
# DuckDB replay) is MERGEABLE: max per register over any file subset
# is exactly the sketch of those files' rows, so the manifest answers
# "how many distinct keys in this table / in this FILTERED slice's
# surviving files" at metadata cost — the Iceberg theta-sketch
# (puffin) shape on plain parquet.

_NDV_TYPES = _BLOOM_TYPES  # same portable string-rendering guarantee


def _validate_ndv_cols(
    types: dict[str, str], cols: list[str], ndv_cols: list[str]
) -> None:
    for c in ndv_cols:
        if c not in cols:
            raise ValueError(
                f"ndv column {c!r} must also be a stats column (have {cols})"
            )
        if types.get(c) not in _NDV_TYPES:
            raise ValueError(
                f"NDV sketches support {sorted(_NDV_TYPES)} columns; "
                f"{c!r} is {types.get(c)!r}"
            )


def _hll_reg_frame(df: DataFrame, c: str) -> DataFrame:
    """``(file, hll_<c>)``: per-file dense HLL register array
    (``array<int>`` of 256) — idx = top 8 bits of one md5-derived
    32-bit hash, register = max first-1-bit ladder over the low 24
    bits; identical math to the hash-oracled portable HLL in
    operators/sketches.py. One extra pass, two map-side-combinable
    aggregates onto #files keys."""
    from quack_reduce_spark.operators.sketches import (
        HLL_M,
        HLL_W_BITS,
        hll_rho,
        md5_h32,
    )

    hashed = (
        df.select(
            _file_col().alias("file"),
            md5_h32(F.col(c).cast("string")).alias("h"),
        )
        .where(F.col(c).isNotNull())
        .select(
            "file",
            F.shiftrightunsigned(F.col("h"), HLL_W_BITS).cast("long").alias("idx"),
            hll_rho(F.col("h").bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))).alias(
                "rho"
            ),
        )
    )
    regs = hashed.groupBy("file", "idx").agg(F.max("rho").alias("M"))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(HLL_M - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__hm"), i.cast("long")), F.lit(0)
        ).cast("int"),
    )
    return regs.groupBy("file").agg(
        F.map_from_entries(F.collect_list(F.struct("idx", "M"))).alias("__hm")
    ).select("file", dense.alias(f"hll_{c}"))


def _attach_ndv(
    df: DataFrame, stats: DataFrame, ndv_cols: list[str]
) -> DataFrame:
    for c in ndv_cols:
        stats = stats.join(_hll_reg_frame(df, c), "file", "left")
    return stats


def hll_merge_estimate(reg_arrays: list) -> dict | None:
    """Merge per-file register arrays (max per register — exact for
    any file subset) and return ``{nonzero, present_sum, est}`` via
    the Flajolet bias-corrected estimator with the linear-counting
    small-range branch — the same arithmetic the hash-oracled
    ``sketch_hll_estimate`` registry key replays in DuckDB SQL. None
    when no file carries registers."""
    import math

    from quack_reduce_spark.operators.sketches import HLL_ALPHA, HLL_M

    merged = [0] * HLL_M
    seen = False
    for arr in reg_arrays:
        if arr is None:
            continue
        seen = True
        for i, v in enumerate(arr):
            if v > merged[i]:
                merged[i] = v
    if not seen:
        return None
    nonzero = sum(1 for v in merged if v > 0)
    present_sum = float(sum(2.0 ** -v for v in merged if v > 0))
    raw = HLL_ALPHA * HLL_M * HLL_M / (present_sum + (HLL_M - nonzero))
    if nonzero < HLL_M and raw <= 2.5 * HLL_M:
        est = HLL_M * math.log(HLL_M / float(HLL_M - nonzero))
    else:
        est = raw
    return {"nonzero": nonzero, "present_sum": present_sum, "est": est}


def manifest_ndv(
    spark: SparkSession, data_dir: str, col: str, rows: list[dict] | None = None
) -> dict | None:
    """Distinct-count estimate for ``col`` from the manifest's per-file
    HLL registers — over the WHOLE table by default, or over a file
    SUBSET when ``rows`` (e.g. the survivors ``prune_files_multi``
    returned) is given: register max is associative, so the merge of
    any subset is exactly the sketch of those files' rows. Metadata
    cost: cached group rows, zero data scanned. None when the manifest
    carries no registers for the column."""
    if rows is None:
        doc, epoch = _read_list_cached(data_dir)
        if doc is None:
            return None
        session_tz = spark.conf.get("spark.sql.session.timeZone")
        rows = _group_rows(spark, data_dir, list(doc["groups"]), (epoch, session_tz))
    return hll_merge_estimate([r.get(f"hll_{col}") for r in rows])


# -- equi-depth histograms (metadata-cost selectivity estimation) -----------
#
# The manifest's exact rows/bytes answer "how big is this TABLE"; a
# cost-based join decision needs "how big is this FILTERED SLICE" —
# which Spark's size-only stats visitor cannot answer (Filter passes
# sizeInBytes through) and an ANALYZE pass answers at a full scan per
# side per query. An equi-depth histogram (B exact quantile boundaries
# per column, one extra percentile aggregate at build time) lets the
# planner estimate range selectivity at METADATA cost: each bin holds
# exactly n/B rows by construction, and a range's fraction is the sum
# of its bin overlaps with linear interpolation inside partial bins —
# the textbook estimator Postgres/Presto CBOs run on their stats.

# column types whose quantiles are meaningful doubles (temporal columns
# participate through their epoch-micros stats representation)
_HIST_TYPES = {"integer", "long", "short", "byte", "float", "double", "timestamp"}
HIST_BINS = 64
# growth factor past the build-time row count at which (a) consumers
# refuse a histogram (engine.explain_join falls back to ANALYZE) and
# (b) append_zonemap proactively REBUILDS it so (a) never fires on a
# maintained table — one shared constant keeps the two in lockstep
HIST_DRIFT = 1.5


def _validate_hist_cols(
    types: dict[str, str], cols: list[str], hist_cols: list[str]
) -> None:
    for c in hist_cols:
        if c not in cols:
            raise ValueError(
                f"histogram column {c!r} must also be a stats column (have {cols})"
            )
        if types.get(c) not in _HIST_TYPES:
            raise ValueError(
                f"equi-depth histograms support {sorted(_HIST_TYPES)} columns; "
                f"{c!r} is {types.get(c)!r}"
            )


def _hist_doc(
    df: DataFrame, hist_cols: list[str], bins: int, types: dict[str, str]
) -> dict[str, dict]:
    """One aggregate over the table: per column, the ``bins + 1`` EXACT
    quantile boundaries (``F.percentile`` — the linear-interpolation
    definition DuckDB's quantile_cont shares, which is what lets the
    registry key hash-prove these numbers) plus the non-null count.
    Session-zoned timestamps are histogrammed in epoch-micros space —
    the same representation their manifest min/max stats use."""
    qs = [i / bins for i in range(bins + 1)]
    aggs = []
    for c in hist_cols:
        src = (
            F.unix_micros(F.col(c)).cast("double")
            if types.get(c) == "timestamp"
            else F.col(c).cast("double")
        )
        aggs.append(F.percentile(src, F.lit(qs).cast("array<double>")).alias(f"__q_{c}"))
        aggs.append(F.count(src).alias(f"__n_{c}"))
    row = df.agg(*aggs).first()
    out: dict[str, dict] = {}
    for c in hist_cols:
        bounds = row[f"__q_{c}"]
        if bounds is None:
            continue  # all-NULL column: no histogram
        out[c] = {
            "bounds": [float(b) for b in bounds],
            "n_nonnull": int(row[f"__n_{c}"]),
            "bins": bins,
        }
    return out


def manifest_hist(data_dir: str) -> dict[str, dict]:
    """The manifest's equi-depth histograms ``{col: {bounds,
    n_nonnull, bins}}`` (empty when none were built)."""
    doc = _read_list(data_dir)
    return dict((doc or {}).get("hist") or {})


def hist_selectivity(
    hist: dict, lo: Any = None, hi: Any = None
) -> float | None:
    """Estimated fraction of one column's NON-NULL rows inside the
    closed range ``[lo, hi]`` from its equi-depth histogram entry —
    each bin holds 1/bins of the rows; partial bins interpolate
    linearly; a zero-width bin (repeated value) counts fully when the
    value is in range. None when the bounds are unusable. Clamped to
    [0, 1]. Timestamp ranges must already be in epoch micros (the
    caller's constraints are — the SQL pushdown decodes literals to
    micros)."""
    bounds = hist.get("bounds")
    if not bounds or len(bounds) < 2:
        return None
    try:
        flo = float(lo) if lo is not None else None
        fhi = float(hi) if hi is not None else None
    except (TypeError, ValueError):
        return None
    nbins = len(bounds) - 1
    total = 0.0
    for i in range(nbins):
        a, b = bounds[i], bounds[i + 1]
        cl = a if flo is None else max(flo, a)
        ch = b if fhi is None else min(fhi, b)
        if ch < cl:
            continue
        if b > a:
            total += (ch - cl) / (b - a)
        else:
            total += 1.0  # point-mass bin, value inside the range
    return max(0.0, min(1.0, total / nbins))


# -- stats build -----------------------------------------------------------


# column types whose per-file SUM is EXACT in any evaluation order —
# the precondition for answering SUM from metadata partials. Doubles
# and floats are excluded (non-associative rounding would make the
# metadata+residual composition differ from a plain scan).
_SUM_TYPES = {"integer", "long", "short", "byte"}


def _sum_col_ok(tname: Any) -> bool:
    return tname in _SUM_TYPES or _unscaled_decimal(tname) is not None


def _sum_wide_dec(tname: Any) -> int | None:
    """Scale ``s`` when ``tname`` is a WIDE decimal (p > 18) — its
    per-file sums stat NATIVELY as decimal(38, s) via try_sum (NULL on
    a single-file 38-digit overflow: consumers decline that file) and
    fold driver-side in exact python-Decimal space, where no overflow
    exists (r15, VERDICT r14 #5)."""
    ps = _decimal_ps(tname)
    if ps is None or ps[0] <= _DEC_MAX_PRECISION:
        return None
    return ps[1]


def _stat_aggs(cols: list[str], types: dict[str, str] | None = None) -> list[Column]:
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
        if types is not None and (
            _sum_col_ok(types.get(c)) or _sum_wide_dec(types.get(c)) is not None
        ):
            # exact per-file sum (r13): integer-family columns and
            # decimal(p<=18) — whose select expr is already the
            # unscaled long, so this is the exact unscaled sum.
            # try_sum turns an int64 overflow into NULL instead of an
            # ANSI error; consumers treat a NULL sum on a non-empty
            # non-all-null file as "unavailable" and decline (sound).
            # WIDE decimals (r15) sum natively as decimal(38, s): a
            # single FILE whose sum tops 38 digits nulls out the same
            # way; the cross-file fold happens driver-side in exact
            # python-Decimal space, where overflow does not exist
            aggs.append(F.try_sum(F.col(c)).alias(f"sum_{c}"))
    return aggs


def _source_types(df: DataFrame, cols: list[str]) -> dict[str, str]:
    """SOURCE type name per stats column, read off the DATA frame's
    schema (``timestamp`` marks the columns whose manifest stats are
    epoch-micros longs; ``decimal(p,s)`` with p <= 18 marks
    unscaled-int stats; ``timestamp_ntz`` stays a native wall-clock
    datetime)."""
    by_name = _py_field_types(df)
    return {c: by_name[c] for c in cols if c in by_name}


def _manifest_types(stats: DataFrame, cols: list[str]) -> dict[str, str]:
    """Source types inferred from a legacy manifest frame's stored
    ``min_<c>`` column types (legacy docs recorded none)."""
    by_name = _py_field_types(stats)
    return {c: by_name[f"min_{c}"] for c in cols if f"min_{c}" in by_name}


def _stats_select_cols(df: DataFrame, cols: list[str]) -> list[Column]:
    """Per-column select expressions for the stats build: session-zoned
    timestamp columns become ``unix_micros`` and decimal(p<=18)
    columns their exact unscaled longs (min/max commute with both
    monotone conversions, so the stored long bounds are exact);
    everything else passes through natively typed."""
    by_name = _py_field_types(df)
    out = []
    for c in cols:
        t = by_name.get(c)
        s = _unscaled_decimal(t)
        if t == "timestamp":
            out.append(F.unix_micros(F.col(c)).alias(c))
        elif s is not None:
            out.append(_unscaled_col(c, s).alias(c))
        else:
            out.append(F.col(c))
    return out


def _epochize_stats(stats: DataFrame, types: dict[str, str]) -> DataFrame:
    """Upgrade a legacy manifest frame in place: min/max of
    session-zoned timestamp columns convert to epoch micros, and
    natively-stored decimal(p<=18) min/max to unscaled longs, VIA
    SPARK (lossless in-engine conversions, no collect-time rendering
    involved). Idempotent: already-long columns pass through."""
    by_name = _py_field_types(stats)
    for c, t in types.items():
        s = _unscaled_decimal(t)
        if t == "timestamp":
            for name in (f"min_{c}", f"max_{c}"):
                if by_name.get(name) == "timestamp":
                    stats = stats.withColumn(name, F.unix_micros(F.col(name)))
        elif s is not None:
            for name in (f"min_{c}", f"max_{c}"):
                if (by_name.get(name) or "").startswith("decimal"):
                    stats = stats.withColumn(
                        name, _unscaled_col(name, s)
                    )
    return stats


def _with_groups(stats: DataFrame) -> DataFrame:
    tok, gdir = _group_cols(F.col("file"))
    return stats.withColumn("__g", tok).withColumn("__gdir", gdir)


def zonemap_stats(spark: SparkSession, data_dir: str, cols: list[str]) -> DataFrame:
    """Per-file stats frame for ``cols``: one row per parquet file with
    ``n_rows`` plus ``min_<c>``, ``max_<c>``, ``nulls_<c>`` per column,
    natively typed (dates stay dates, doubles stay doubles) EXCEPT
    session-zoned timestamps, which are kept as exact epoch-micros
    longs so no collect-time timezone rendering can ever touch a
    pruning comparison. Single partial/final aggregate onto #files
    keys — the only full-table pass zone maps ever make."""
    df = spark.read.parquet(data_dir)
    return (
        df.select(
            _file_col().alias("file"),
            F.col("_metadata.file_size").alias("__fsize"),
            *_stats_select_cols(df, cols),
        )
        .groupBy("file")
        .agg(*_stat_aggs(cols, _source_types(df, cols)))
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

    statted = {_unq(_bare(r["file"])) for r in stats.select("file").collect()}
    missing = [p for p in candidates if _unq(_bare(p)) not in statted]
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


def write_zonemap(
    spark: SparkSession,
    data_dir: str,
    cols: list[str],
    bloom_cols: list[str] | dict[str, dict] | None = None,
    bloom_bits_per_key: int = BLOOM_BPK,
    bloom_k: int = BLOOM_K,
    hist_cols: list[str] | dict[str, dict] | None = None,
    hist_bins: int = HIST_BINS,
    ndv_cols: list[str] | dict[str, dict] | None = None,
    group_stats_cols: list[str] | dict[str, dict] | None = None,
    group_stats_max: int = GROUP_STATS_MAX_PER_FILE,
) -> int:
    """Build and persist the grouped manifest at ``<data_dir>/_zonemap``
    (one manifest per data directory + ``_list.json``). Returns the
    number of data files covered. Rebuild after any rewrite of the
    table; the versioned-lake integration gets this for free because
    version directories are immutable (stats written once per version
    can never go stale).

    ``bloom_cols``: integer/string stats columns that additionally get
    a per-file Bloom FINGERPRINT (dense 62-bit-word bitset, sized
    ``bloom_bits_per_key`` bits per row of the largest file) — point
    and IN-list lookups then skip files on ANY layout, not just
    clustered ones. ``None`` (the default) INHERITS the previous
    manifest's fingerprint config, so maintenance rebuilds
    (compact/optimize/cluster) preserve fingerprints without the
    caller knowing about them; pass ``[]`` to drop them explicitly.
    Cost: one extra distributed pass over the table per fingerprinted
    column at build time; ~``bpk``/8 bytes per row per column in the
    manifest.

    ``hist_cols``: numeric/timestamp stats columns that get a
    table-level EQUI-DEPTH HISTOGRAM (``hist_bins`` exact quantile
    boundaries, ONE extra aggregate at build time) — the planner's
    metadata-cost range-selectivity estimate (``hist_selectivity``,
    consumed by ``Engine.explain_join`` for FILTERED sides).
    Estimation metadata only: nothing prunes by it, so staleness after
    appends degrades estimate quality, never correctness (the doc
    records ``n_rows_at_build`` so consumers can refuse a drifted
    histogram). Same ``None``-inherits / ``[]``-drops contract as
    ``bloom_cols``.

    ``ndv_cols``: integer/string stats columns that get a PER-FILE HLL
    register sketch (p=8, mergeable — max per register over any file
    subset is exactly that subset's sketch), so ``manifest_ndv``
    answers table- and slice-level DISTINCT counts at metadata cost —
    the input a join-cardinality estimate needs. Same contract as
    ``bloom_cols``; one extra pass per column at build.

    ``group_stats_cols``: LOW-NDV stats columns that get PER-FILE
    PER-GROUP partials (the Iceberg partition-stats shape): one stats
    row per (file, value), so the grouped aggregate pushdown answers
    ``GROUP BY col`` from metadata on ANY layout — clustered or not.
    Files with more than ``group_stats_max`` distinct values are
    excluded (the reader scans them). Same ``None``-inherits /
    ``[]``-drops contract as ``bloom_cols``; one extra grouped pass
    per column at build."""
    df = spark.read.parquet(data_dir)
    types = _source_types(df, cols)
    prev = (
        _read_list(data_dir)
        if (
            bloom_cols is None
            or hist_cols is None
            or ndv_cols is None
            or group_stats_cols is None
        )
        else None
    )
    inherited: dict[str, dict] = {}
    if bloom_cols is None:
        inherited = dict((prev or {}).get("bloom") or {})
        bloom_cols = [c for c in inherited if c in cols]
    elif isinstance(bloom_cols, dict):
        # a carried-over config (bloom_config of a table about to be
        # rewritten into a FRESH directory, where same-dir inheritance
        # has nothing to read): per-column bpk/k survive the move
        inherited = dict(bloom_cols)
        bloom_cols = [c for c in inherited if c in cols]
    _validate_bloom_cols(types, cols, bloom_cols)
    hist_inherited: dict[str, dict] = {}
    if hist_cols is None:
        hist_inherited = dict((prev or {}).get("hist") or {})
        hist_cols = [c for c in hist_inherited if c in cols]
    elif isinstance(hist_cols, dict):
        hist_inherited = dict(hist_cols)
        hist_cols = [c for c in hist_inherited if c in cols]
    _validate_hist_cols(types, cols, hist_cols)
    if ndv_cols is None:
        ndv_cols = [c for c in ((prev or {}).get("ndv") or {}) if c in cols]
    elif isinstance(ndv_cols, dict):
        ndv_cols = [c for c in ndv_cols if c in cols]
    _validate_ndv_cols(types, cols, ndv_cols)
    gs_inherited: dict[str, dict] = {}
    if group_stats_cols is None:
        gs_inherited = dict((prev or {}).get("group_stats") or {})
        group_stats_cols = [
            k for k in gs_inherited
            if all(c in cols for c in _gs_components(k))
        ]
    elif isinstance(group_stats_cols, dict):
        gs_inherited = dict(group_stats_cols)
        group_stats_cols = [
            k for k in gs_inherited
            if all(c in cols for c in _gs_components(k))
        ]
    else:
        # tuples/lists of columns normalize to the canonical "a,b"
        # composite key form the config doc stores
        group_stats_cols = [_gs_key(k) for k in group_stats_cols]
    _validate_group_stats_cols(types, cols, group_stats_cols)
    stats = _cover_empty_files(
        spark, data_dir, zonemap_stats(spark, data_dir, cols), _data_files(data_dir)
    )
    # pin the per-file rows (#files-scale) so the sizing aggregates
    # below never re-run the table scan
    stats = stats.localCheckpoint()
    bloom_doc: dict[str, dict] = {}
    if bloom_cols:
        max_rows = stats.agg(F.max("n_rows")).first()[0] or 1
        for c in bloom_cols:
            bpk = int(inherited.get(c, {}).get("bpk", bloom_bits_per_key))
            k = int(inherited.get(c, {}).get("k", bloom_k))
            bloom_doc[c] = {"m": _bloom_m_for(max_rows, bpk), "k": k, "bpk": bpk}
        stats = _attach_blooms(df, stats, bloom_doc)
    ndv_doc: dict[str, dict] = {}
    if ndv_cols:
        from quack_reduce_spark.operators.sketches import HLL_M, HLL_P

        stats = _attach_ndv(df, stats, ndv_cols)
        ndv_doc = {c: {"m": HLL_M, "p": HLL_P} for c in ndv_cols}
    hist_doc: dict[str, dict] = {}
    if hist_cols:
        per_col_bins = {
            c: int(hist_inherited.get(c, {}).get("bins", hist_bins))
            for c in hist_cols
        }
        # boundaries are always RECOMPUTED from the current rows (a
        # rebuild is exactly when a histogram should refresh); only
        # the per-column bin counts are inherited
        uniform = len(set(per_col_bins.values())) == 1
        if uniform:
            hist_doc = _hist_doc(df, hist_cols, next(iter(per_col_bins.values())), types)
        else:
            for c in hist_cols:
                hist_doc.update(_hist_doc(df, [c], per_col_bins[c], types))
        n_now = int(stats.agg(F.sum("n_rows")).first()[0] or 0)
        for c in hist_doc:
            hist_doc[c]["n_rows_at_build"] = n_now
    gs_doc: dict[str, dict] = {}
    for c in group_stats_cols:
        mg = int(gs_inherited.get(c, {}).get("max_groups", group_stats_max))
        gsf = _group_stats_frame(df, c, cols, types, mg).localCheckpoint()
        gsf.write.mode("overwrite").parquet(_gstats_path(data_dir, c))
        gs_doc[c] = {"max_groups": mg, "entries": gsf.count()}
    stats_g = _with_groups(stats).localCheckpoint()
    _write_grouped(spark, data_dir, stats_g, dynamic=False)
    groups = _group_summaries(stats_g, cols)
    _write_list(
        data_dir, cols, groups, types=types,
        bloom=bloom_doc or None, hist=hist_doc or None, ndv=ndv_doc or None,
        group_stats=gs_doc or None,
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


def bloom_config(data_dir: str) -> dict[str, dict]:
    """The manifest's Bloom-fingerprint config ``{col: {m, k, bpk}}``
    (empty when none) — capture it BEFORE a rewrite that stages into a
    fresh directory and pass it back as ``write_zonemap(...,
    bloom_cols=<config>)`` so fingerprints survive the move."""
    doc = _read_list(data_dir)
    return dict((doc or {}).get("bloom") or {})


def ndv_config(data_dir: str) -> dict[str, dict]:
    """The manifest's NDV-sketch config ``{col: {m, p}}`` (empty when
    none) — same capture-before-rewrite contract as bloom_config."""
    doc = _read_list(data_dir)
    return dict((doc or {}).get("ndv") or {})


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


def _rebuild_from_rows(
    spark: SparkSession, data_dir: str, old: DataFrame, cols: list[str]
) -> None:
    """Rewrite the whole grouped manifest from existing manifest ROWS
    (no table rescan): fills missing file_bytes, converts any
    natively-stored session-zoned timestamp stats to epoch micros
    (lossless — unix_micros reads the stored internal value), and
    commits a fresh v3 list doc."""
    if "file_bytes" not in old.columns:  # r9 manifests predate sizes
        old = old.withColumn("file_bytes", F.lit(None).cast("long"))
    types = _manifest_types(old, cols)
    old = _epochize_stats(old, types)
    stats_g = _with_groups(old).localCheckpoint()
    _write_grouped(spark, data_dir, stats_g, dynamic=False)
    _write_list(data_dir, cols, _group_summaries(stats_g, cols), types=types)


def _upgrade_legacy(spark: SparkSession, data_dir: str) -> list[str]:
    """Rewrite a pre-v3 manifest (round-9 single-file layouts AND v2
    grouped layouts, whose timestamp stats were stored natively) into
    the v3 epoch-space grouped layout — from the manifest's OWN rows
    (no table rescan). Migrating the whole tree at once keeps every
    group's parquet schema consistent (a v2/v3 mix would make the
    recursive manifest read see timestamp vs long for the same
    column). Returns the stats columns. Idempotent: v3 layouts pass
    through."""
    doc = _read_list(data_dir)
    if doc is not None and doc.get("version", 2) >= 3:
        return list(doc["cols"])
    old = read_zonemap(spark, data_dir)
    if doc is not None:
        cols = list(doc["cols"])
    else:
        cols = [c[len("min_"):] for c in old.columns if c.startswith("min_")]
    _rebuild_from_rows(spark, data_dir, old, cols)
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
        # _unq: pre-fix manifests may hold URI-encoded paths
        known = {
            _unq(_bare(r["file"]))
            for r in old_touched.select("file").collect()
        }
    fresh_files = [
        p
        for t in suspect
        for p in by_tok[t]
        if _unq(_bare(p)) not in known
    ]
    if not fresh_files:
        return 0
    # basePath keeps hive partition columns resolvable when reading
    # explicit file paths, so partition columns remain valid stats_cols
    df = spark.read.option("basePath", data_dir).parquet(*fresh_files)
    types = dict((doc or {}).get("types") or _source_types(df, cols))
    fresh = (
        df.select(
            _file_col().alias("file"),
            F.col("_metadata.file_size").alias("__fsize"),
            *_stats_select_cols(df, cols),
        )
        .groupBy("file")
        .agg(*_stat_aggs(cols, types))
    )
    bloom_doc = dict((doc or {}).get("bloom") or {})
    if bloom_doc:
        # fingerprint the DELTA files with the manifest's recorded
        # m/k — a delta file larger than the build's sizing basis gets
        # a denser (higher-fp) bitset, never a false negative
        fresh = _attach_blooms(df, fresh, bloom_doc)
    ndv_doc = dict((doc or {}).get("ndv") or {})
    if ndv_doc:
        # register-sketch the delta files; the table/slice merge stays
        # exact because register max is associative over files
        fresh = _attach_ndv(df, fresh, list(ndv_doc))
    gs_doc = dict((doc or {}).get("group_stats") or {})
    for c, cfg in gs_doc.items():
        # per-group partials for the DELTA files only (existing files'
        # rows are immutable under the append contract) — appended to
        # the per-column stats table; the per-file cap applies to each
        # new file independently
        mg = int(cfg.get("max_groups", GROUP_STATS_MAX_PER_FILE))
        gsf = _group_stats_frame(df, c, cols, types, mg)
        gpath = _gstats_path(data_dir, c)
        # CRASH-SAFETY (r15): this parquet append commits BEFORE the
        # _write_list below, so a maintenance run that dies in between
        # leaves slice rows for files the (unchanged) manifest still
        # calls fresh — a naive re-run would append the same files'
        # rows AGAIN and the duplicated partials would silently
        # double-count grouped answers. The repair (anti-join the
        # delta against files already recorded + an exact recount) is
        # O(slice history), so it runs ONLY when a crash is actually
        # suspected: a healthy append always writes gstats strictly
        # BEFORE its list commit, so a gstats mtime at-or-after the
        # list's means a run died between the two. Readers are safe
        # regardless (duplicate-key demotion + the slice-sum integrity
        # gate), so a missed suspicion degrades files to scans, never
        # to wrong answers.
        suspect_crash = True
        try:
            from quack_reduce_spark.lake import _fs_for

            fs = _fs_for(data_dir)
            lk = fs.stat_key(_list_path(data_dir))
            gk = fs.stat_key(gpath)
            suspect_crash = lk is None or gk is None or gk[0] >= lk[0]
        except Exception:
            pass  # unknown state: pay the repair cost, stay exact
        if suspect_crash:
            try:
                prior = spark.read.parquet(gpath).select("file").distinct()
                gsf = gsf.join(prior, "file", "left_anti")
            except Exception:
                pass  # no gstats table yet (adopted legacy doc)
        gsf = gsf.localCheckpoint()
        n_new = int(gsf.count())
        if n_new:
            gsf.write.mode("append").parquet(gpath)
        if suspect_crash:
            try:
                # exact recount (footer-only) — the read-cap gate must
                # see the REAL size, including a crashed run's rows
                entries = int(spark.read.parquet(gpath).count())
            except Exception:
                entries = int(cfg.get("entries", 0)) + n_new
        else:
            entries = int(cfg.get("entries", 0)) + n_new
        gs_doc[c] = {**cfg, "entries": entries}
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
        # pre-v3 manifests stored session-zoned timestamps natively:
        # upgrade the touched groups' rows to epoch micros (lossless
        # in-Spark conversion) before merging with the fresh longs
        old_g = _with_groups(_epochize_stats(old_touched, types)).filter(
            F.col("__g").isin(*fresh_toks)
        )
        # allowMissingColumns: a bloom column enabled after the old
        # group was written (or vice versa) fills NULL bitsets, which
        # the probe treats as 'no fingerprint: keep the file'
        merged = old_g.unionByName(fresh_g, allowMissingColumns=True)
    else:
        merged = fresh_g
    # localCheckpoint pins the touched groups' old rows in memory so
    # the dynamic overwrite cannot clobber the frame mid-read
    merged = merged.localCheckpoint()
    _write_grouped(spark, data_dir, merged, dynamic=True)
    for tok, entry in _group_summaries(merged, cols).items():
        groups[tok] = entry
    # histograms normally pass through UNCHANGED on append — they are
    # estimation metadata sized at build time, and recomputing them
    # every append would cost the full-table pass appends exist to
    # avoid. But once cumulative growth crosses the SAME 1.5x drift
    # threshold at which the planner refuses them (engine.explain_join
    # would silently fall back to a counting scan), they are REBUILT
    # here: each refresh resets the basis, so over a table's lifetime
    # the full-table passes amortize geometrically (O(log growth)),
    # and join planning stays metadata-cost on a growing table.
    hist_doc = dict((doc or {}).get("hist") or {})
    if hist_doc:
        built = min(
            (int(h.get("n_rows_at_build", 0)) for h in hist_doc.values()),
            default=0,
        )
        counts = [g.get("n_rows") for g in groups.values()]
        n_live = sum(int(x) for x in counts) if all(
            x is not None for x in counts
        ) else None  # pre-r13 list entries lack counts: keep stale, sound
        if built > 0 and n_live is not None and n_live > HIST_DRIFT * built:
            full = spark.read.parquet(data_dir)
            per_bins = {
                c: int(h.get("bins", HIST_BINS)) for c, h in hist_doc.items()
            }
            refreshed: dict[str, dict] = {}
            if len(set(per_bins.values())) == 1:
                refreshed = _hist_doc(
                    full, list(hist_doc), next(iter(per_bins.values())), types
                )
            else:
                for c in hist_doc:
                    refreshed.update(_hist_doc(full, [c], per_bins[c], types))
            for c in refreshed:
                refreshed[c]["n_rows_at_build"] = n_live
            hist_doc = refreshed or hist_doc
    _write_list(
        data_dir, cols, groups, types=types,
        bloom=bloom_doc or None, hist=hist_doc or None,
        ndv=ndv_doc or None, group_stats=gs_doc or None,
    )
    return len(fresh_files)


# -- per-file PER-GROUP partials (Iceberg partition-stats shape) ------------
#
# File-level min/max answer a GROUP BY from metadata only when every
# surviving file is SINGLE-VALUED on the grouping key — a clustered
# layout. On an unclustered table every file mixes groups and the
# grouped pushdown always falls back to the full scan. This section
# records, for designated LOW-NDV columns, one stats row per
# (file, group value): n_rows plus min/max/nulls/sum for every stats
# column WITHIN that slice. groupBy(file, value) partitions the file's
# rows exactly, so slice partials sum/fold to the file's — the grouped
# pushdown can then merge per-group partials on ANY layout, and even
# classify predicates per slice (a slice's own min/max are tighter
# than the file's). Files with more than ``max_groups`` distinct
# values are EXCLUDED wholesale (the reader treats absence as "scan
# this file"), which bounds manifest size to max_groups rows/file.

# GROUP_STATS_DIR / GROUP_STATS_MAX_PER_FILE / GROUP_STATS_READ_MAX are
# defined at the top of the module (write_zonemap's signature needs
# them); the READ_MAX caps the (file, group) rows collected to the
# driver — a table past it should cluster on the key instead
# (file-level stats then pin every file): the reader declines, never
# degrades.

# value types whose collect() rendering is exact and zone-free (the
# grouped pushdown's own row-rendered key gate)
_GSTATS_TYPES = {"integer", "long", "short", "byte", "string", "date"}

# driver-side slice-row cache, LRU-bounded by TOTAL ROWS across all
# (table, column) entries: one entry is capped at GROUP_STATS_READ_MAX
# by the read gate, but many registered gstats tables would otherwise
# pin unbounded python dicts for the session's lifetime (the cache is
# only epoch-evicted on manifest commits of the SAME table)
_GSTATS_CACHE: dict[tuple[str, str], tuple[Any, dict[str, list[dict]], int]] = {}
_GSTATS_CACHE_MAX_ROWS = 2 * GROUP_STATS_READ_MAX


def _gstats_cache_put(key: tuple[str, str], epoch: Any, by_file: dict) -> None:
    n = sum(len(v) for v in by_file.values())
    _GSTATS_CACHE.pop(key, None)
    while (
        _GSTATS_CACHE
        and sum(e[2] for e in _GSTATS_CACHE.values()) + n
        > _GSTATS_CACHE_MAX_ROWS
    ):
        _GSTATS_CACHE.pop(next(iter(_GSTATS_CACHE)))  # oldest-inserted
    _GSTATS_CACHE[key] = (epoch, by_file, n)


def _gstats_path(data_dir: str, col: str) -> str:
    return f"{data_dir.rstrip('/')}/{GROUP_STATS_DIR}/{col}"


# composite slice keys (r15, VERDICT r14 #3): a config key may name a
# COLUMN TUPLE as "a,b" — slices are then per (file, a-value, b-value),
# so GROUP BY (a, b) pushes down on layouts where NEITHER key clusters.
# The per-file cap applies to the COMBINATION count (the product is
# what the cap bounds), files above it excluded wholesale — the same
# discipline as single-column slices.
GROUP_STATS_MAX_COMPOSITE = 3


def _gs_components(key) -> list[str]:
    """Component columns of a group-stats config key: a plain column
    name, an ``"a,b"`` composite string, or a tuple/list of names."""
    if isinstance(key, (tuple, list)):
        return [str(c) for c in key]
    return [c for c in str(key).split(",") if c]


def _gs_key(key) -> str:
    return ",".join(_gs_components(key))


def _validate_group_stats_cols(
    types: dict[str, str], cols: list[str], gcols: list[str]
) -> None:
    for key in gcols:
        comps = _gs_components(key)
        if not 1 <= len(comps) <= GROUP_STATS_MAX_COMPOSITE:
            raise ValueError(
                f"group_stats key {key!r} must name 1-"
                f"{GROUP_STATS_MAX_COMPOSITE} columns"
            )
        if len(set(comps)) != len(comps):
            raise ValueError(f"group_stats key {key!r} repeats a column")
        for c in comps:
            if c not in cols:
                raise ValueError(
                    f"group_stats column {c!r} is not a stats column"
                )
            if types.get(c) not in _GSTATS_TYPES:
                raise ValueError(
                    f"group_stats column {c!r} has type {types.get(c)!r}; "
                    f"supported: {sorted(_GSTATS_TYPES)}"
                )


def _gstat_aggs(cols: list[str], types: dict[str, str]) -> list[Column]:
    """Per-slice stats aggregates — the file-level layout minus
    file_bytes (slices have no size)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"))
        if _sum_col_ok(types.get(c)) or _sum_wide_dec(types.get(c)) is not None:
            aggs.append(F.try_sum(F.col(c)).alias(f"sum_{c}"))
    return aggs


def _group_stats_frame(
    df: DataFrame,
    gcol: str,
    cols: list[str],
    types: dict[str, str],
    max_groups: int,
) -> DataFrame:
    """One row per (file, value(s) of ``gcol``) with slice-level
    stats, excluding files with more than ``max_groups`` distinct
    value combinations (absence = the reader scans the file). A
    composite key ``"a,b"`` stores its components as ``__gv0``,
    ``__gv1``, ...; a single column keeps the legacy ``__gv`` name."""
    from pyspark.sql import Window

    comps = _gs_components(gcol)
    if len(comps) == 1:
        gv_cols = [F.col(comps[0]).alias("__gv")]
        gv_names = ["__gv"]
    else:
        gv_cols = [
            F.col(c).alias(f"__gv{i}") for i, c in enumerate(comps)
        ]
        gv_names = [f"__gv{i}" for i in range(len(comps))]
    src = df.select(
        _file_col().alias("file"),
        *gv_cols,  # native: _GSTATS_TYPES render exactly
        *_stats_select_cols(df, cols),
    )
    agged = src.groupBy("file", *gv_names).agg(*_gstat_aggs(cols, types))
    w = Window.partitionBy("file")
    return (
        agged.withColumn("__ng", F.count(F.lit(1)).over(w))
        .filter(F.col("__ng") <= max_groups)
        .drop("__ng")
    )


def group_stats_config(data_dir: str) -> dict[str, dict]:
    """The manifest's per-group-partials config
    ``{col: {max_groups, entries}}`` (empty when none)."""
    doc = _read_list(data_dir)
    return dict((doc or {}).get("group_stats") or {})


def group_stats_rows(
    spark: SparkSession, data_dir: str, col: str
) -> dict[str, list[dict]] | None:
    """All (file, group) slice rows for ``col`` as
    ``{file: [row dicts]}``, cached on the manifest-list commit epoch
    (the same discipline as the per-file manifest cache). None when
    the config is absent, the recorded entry count exceeds the reader
    cap, or the read fails — callers fall back to file-level stats."""
    doc, epoch = _read_list_cached(data_dir)
    cfg = ((doc or {}).get("group_stats") or {}).get(col)
    if cfg is None:
        return None
    if int(cfg.get("entries", 0)) > GROUP_STATS_READ_MAX:
        return None
    hit = _GSTATS_CACHE.get((data_dir, col))
    if hit is not None and hit[0] == epoch:
        # LRU touch: re-insert so row-budget eviction drops cold entries
        _GSTATS_CACHE.pop((data_dir, col), None)
        _GSTATS_CACHE[(data_dir, col)] = hit
        return hit[1]
    try:
        IO_COUNTS["group_reads"] += 1
        rows = [
            r.asDict()
            for r in spark.read.parquet(_gstats_path(data_dir, col)).collect()
        ]
    except Exception:
        return None
    by_file: dict[str, list[dict]] = {}
    for r in rows:
        by_file.setdefault(_unq(_bare(r["file"])), []).append(r)
    # decline-never-wrong: duplicated (file, slice-value) keys — the
    # double append of a PRE-r15 crash-rerun — would double-count
    # partials; demote such files to the boundary scan by dropping
    # their slice entry (absence = the reader scans the file)
    gv_cols = None
    for f, rs in list(by_file.items()):
        if gv_cols is None:
            gv_cols = sorted(k for k in rs[0] if k.startswith("__gv"))
        seen = {tuple(r.get(k) for k in gv_cols) for r in rs}
        if len(seen) < len(rs):
            del by_file[f]
    _gstats_cache_put((data_dir, col), epoch, by_file)
    return by_file


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


def _any_in_interval(vals: Any, mn: Any, mx: Any) -> bool:
    """True iff some IN value can sit inside [mn, mx]. A SORTED tuple
    (the normalized form large value sets take) binary-searches —
    O(log V) per file instead of O(V), which is what lets the InSet
    cap sit in the tens of thousands; any other container scans."""
    if isinstance(vals, tuple):
        i = 0 if mn is None else bisect.bisect_left(vals, mn)
        return i < len(vals) and (mx is None or vals[i] <= mx)
    return any(mn <= v <= mx for v in vals)


def _file_matches(
    row: dict,
    constraints: dict[str, tuple],
    bloom: dict[str, dict] | None = None,
    bloom_memo: dict | None = None,
) -> bool:
    """Python twin of the manifest range filter: the file survives iff
    EVERY constrained column's stats can hold a matching row. A
    ``(lo, hi, vals, nullness)`` constraint checks, in order: IS NULL
    needs the file to CONTAIN nulls (null-count > 0); everything else
    (ranges, IN value sets, IS NOT NULL) cannot match an all-NULL file
    (NULL min/max); then the [min, max] interval must intersect the
    range / hold some IN value. Incomparable values keep the file
    (sound); a missing null-count stat keeps the file too.

    ``bloom``: per-column fingerprint config — equality and IN-list
    constraints on fingerprinted columns additionally require SOME
    candidate value to pass the file's Bloom bitset, which is what
    prunes point lookups on layouts min/max can't help (the bitset has
    no false negatives, so this only ever skips files that provably
    lack every candidate)."""
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
            if row.get(f"nulls_{col}") is None:
                # column not statted in this manifest AT ALL (vs an
                # all-NULL file, which records a null count): nothing
                # to prune on — the file must be kept, or a caller
                # constraining an un-statted column (count_where, the
                # SQL agg pushdown) would silently lose its rows
                continue
            return False
        fp = (bloom or {}).get(col)
        try:
            if vals is not None:
                if not _any_in_interval(vals, mn, mx):
                    return False
                if fp is not None and not _bloom_any(
                    row, col, vals, mn, mx, fp, bloom_memo if bloom_memo is not None else {}
                ):
                    return False
                continue
            if lo is not None and mx < lo:
                return False
            if hi is not None and mn > hi:
                return False
            if (
                fp is not None
                and lo is not None
                and lo == hi
                and not _bloom_any(
                    row, col, (lo,), mn, mx, fp, bloom_memo if bloom_memo is not None else {}
                )
            ):
                return False
        except TypeError:
            continue  # incomparable: keep the file
    return True


def _normalize_constraints(
    constraints: dict[str, tuple],
    types: dict[str, str],
    session_tz: str,
) -> dict[str, tuple]:
    """Per-column constraint normalization before matching: bounds on
    epoch-space timestamp columns convert to micros (:func:`_to_micros`
    — the SQL pushdown already supplies raw micros; datetimes from the
    explicit scan_pruned API convert here), and IN value sets become
    SORTED tuples so both the group-level and per-file checks binary-
    search instead of scanning (incomparable mixes stay as given and
    fall back to the linear scan)."""
    out: dict[str, tuple] = {}
    for col, constraint in constraints.items():
        lo, hi, vals = constraint[0], constraint[1], constraint[2]
        nullness = constraint[3] if len(constraint) > 3 else None
        dec_s = _unscaled_decimal(types.get(col))
        if types.get(col) == "timestamp":
            lo = _to_micros(lo, session_tz) if lo is not None else None
            hi = _to_micros(hi, session_tz) if hi is not None else None
            if vals is not None:
                vals = [_to_micros(v, session_tz) for v in vals]
        elif dec_s is not None:
            lo = _to_unscaled_bound(lo, dec_s, ceil=True) if lo is not None else None
            hi = _to_unscaled_bound(hi, dec_s, ceil=False) if hi is not None else None
            if vals is not None:
                # values not representable at the column scale match
                # NO row: dropping them is exact, not a widening
                vals = [
                    x
                    for x in (_to_unscaled_val(v, dec_s) for v in vals)
                    if x is not None
                ]
        if vals is not None and not isinstance(vals, tuple):
            try:
                vals = tuple(sorted(vals))
            except TypeError:
                vals = frozenset(vals)  # linear-scan fallback
        out[col] = (lo, hi, vals, nullness)
    return out


def _group_holds_vals(glo: Any, ghi: Any, vals: Any) -> bool:
    """Group-level IN check: can SOME value sit inside the group's
    [glo, ghi]? Unknown bounds keep the group; an all-NULL group (both
    None) can't match any value; sorted tuples binary-search."""
    if glo is _UNKNOWN or ghi is _UNKNOWN:
        return True
    if glo is None and ghi is None:
        return False
    try:
        return _any_in_interval(vals, glo, ghi)
    except TypeError:
        return True  # incomparable types: keep the group (sound)


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
    doc, epoch = _read_list_cached(data_dir)
    session_tz = spark.conf.get("spark.sql.session.timeZone")
    bloom = dict((doc or {}).get("bloom") or {})
    bloom_memo: dict = {}
    if doc is None:
        zm = read_zonemap(spark, data_dir)  # legacy layout: uncached
        IO_COUNTS["group_reads"] += 1
        rows = [r.asDict() for r in zm.collect()]
        total = len(rows)
    else:
        groups = doc["groups"]
        types = doc.get("types") or {}
        constraints = _normalize_constraints(constraints, types, session_tz)
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
                glo = _dec(st["lo"], types.get(col))
                ghi = _dec(st["hi"], types.get(col))
                if vals is not None:
                    if not _group_holds_vals(glo, ghi, vals):
                        ok = False
                        break
                elif not _intersects(glo, ghi, lo, hi):
                    ok = False
                    break
            if ok:
                live.append(tok)
        if not live:
            return [], total
        rows = _group_rows(spark, data_dir, live, (epoch, session_tz))
    return [
        r for r in rows if _file_matches(r, constraints, bloom, bloom_memo)
    ], total


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
    doc, epoch = _read_list_cached(data_dir)
    session_tz = spark.conf.get("spark.sql.session.timeZone")
    types: dict[str, str] = {}
    if doc is None:
        rows = [r.asDict() for r in read_zonemap(spark, data_dir).collect()]
        cols = sorted(
            c[len("min_"):] for c in (rows[0] if rows else {}) if c.startswith("min_")
        )
    else:
        rows = _group_rows(
            spark, data_dir, list(doc["groups"]), (epoch, session_tz)
        )
        cols = list(doc["cols"])
        types = doc.get("types") or {}
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
        mn = min(mins) if mins else None
        mx = max(maxs) if maxs else None
        if types.get(c) == "timestamp":
            # epoch-space stats render to the same naive datetime a
            # collect() of the raw column would produce (display only;
            # pruning never touches this rendering)
            mn = _ts_render(mn) if isinstance(mn, int) else mn
            mx = _ts_render(mx) if isinstance(mx, int) else mx
        out["columns"][c] = {
            "min": mn,
            "max": mx,
            "nulls": sum(int(r.get(f"nulls_{c}", 0)) for r in rows),
        }
    if doc is not None:
        # the r12 metadata layers, surfaced in the same ANALYZE
        # readout: NDV estimates from the per-file register merge,
        # plus which columns carry fingerprints/histograms
        for c in (doc.get("ndv") or {}):
            got = hll_merge_estimate([r.get(f"hll_{c}") for r in rows])
            if got is not None:
                out["columns"].setdefault(c, {})["ndv_est"] = round(got["est"], 1)
        out["bloom_cols"] = sorted(doc.get("bloom") or {})
        out["hist_cols"] = sorted(doc.get("hist") or {})
        out["ndv_cols"] = sorted(doc.get("ndv") or {})
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
    cost reads, never correctness.

    Session-zoned timestamp columns: naive datetime bounds mean the
    SESSION zone (the semantics a SQL literal has), and BOTH the prune
    step and the re-applied filter compare in epoch-micros space —
    ``F.lit(datetime)`` would instead convert through the driver-OS
    zone (PySpark ``toInternal``), silently disagreeing with the
    pruning interpretation on any off-UTC host."""
    files, total = prune_files(spark, data_dir, col, lo, hi)
    if files:
        # basePath keeps hive partition columns resolvable when the
        # survivors are read by explicit path
        df = spark.read.option("basePath", data_dir).parquet(*files)
    else:
        df = spark.read.parquet(data_dir).limit(0)
    ctype = {f.name: f.dataType.typeName() for f in df.schema.fields}.get(col)
    if ctype == "timestamp":
        session_tz = spark.conf.get("spark.sql.session.timeZone")
        target = F.unix_micros(F.col(col))
        lo = _to_micros(lo, session_tz) if lo is not None else None
        hi = _to_micros(hi, session_tz) if hi is not None else None
    else:
        target = F.col(col)
    pred = F.col(col).isNotNull()
    if lo is not None:
        pred = pred & (target >= F.lit(lo))
    if hi is not None:
        pred = pred & (target <= F.lit(hi))
    return df.filter(pred), len(files), total
