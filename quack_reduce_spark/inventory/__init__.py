"""The oracle-tested query inventory (SURVEY.md §2).

Each submodule exposes ``QUERIES: dict[str, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL over the
pre-registered fixture views). Keys are prefixed by SURVEY §2 tier:

- ``a*``  — Tier A, operators the reference's own queries exercise
- ``b_*`` — Tier B, the delegated full-SQL surface (spark.sql parity)
- ``ts_*`` — time-series / windowing (events table; SURVEY §2 Tier C hook)
- ``text_*`` / ``dedup_*`` / ``sim_*`` / ``mm_*`` — north-star
  LLM-data-pipeline operators (BASELINE.json)

Queries without an oracle entry (non-SQL-expressible: MinHash-LSH,
SimHash, random-hyperplane LSH) get the driver's rows-only check and are
additionally unit-tested in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory import (
    approx,
    dedup,
    dq,
    graph,
    mlprep,
    mleval,
    multimodal,
    relational,
    relational2,
    relational3,
    relational4,
    retrieval,
    similarity,
    sketches,
    lakeops,
    streaming_live,
    text,
    text2,
    text3,
    timeseries,
    tpch,
    tpch2,
    udfs,
)

_MODULES = [
    relational,
    relational2,
    relational3,
    relational4,
    tpch,
    tpch2,
    timeseries,
    lakeops,
    streaming_live,
    text,
    text2,
    text3,
    retrieval,
    dedup,
    graph,
    similarity,
    multimodal,
    approx,
    sketches,
    udfs,
    mlprep,
    dq,
    mleval,
]

# Deliberate registry ordering: the external driver differential-checks
# queries in dict insertion order with a bounded budget (50 keys per
# round), so the head of the registry is curated each round to spend
# that budget where it yields NEW information. As of round 7 every
# oracled key has been driver-sampled green at least once (full
# coverage); from round 8 on, the budget goes to (a) the stable
# sentinels, (b) keys whose code changed this round, and (c) the keys
# with the STALEST evidence — oldest last-sampled round first — so the
# median evidence age keeps falling. No rows-only keys in the head:
# they would burn budget on a permanent "no_oracle" row (the r3
# lesson). The full registry passes tools/check_oracle.py locally at
# sf0.001/sf0.01 regardless of head selection; see
# tests/test_inventory_counts.py for the registry-size drift gate.
_HEAD = [
    # Stable sentinels — Tier A + one per family, driver-green 7 rounds
    "a01_scan_project", "a09_topk",
    "b_join_star_broadcast",
    "tpch_q1_full",
    "ts_asof_join",
    "stream_tumbling_agg",
    "text_quality",
    "dedup_lsh_index_probe",  # r8: index-path race fix — re-verify
    "sim_cosine_topk",
    "graph_triangles",  # r8: oracle now interpolates TRIANGLE_QTY_MIN — re-verify
    # Round-8 code change — lake.py commit/_effective_timeline rework
    # (optimistic concurrency + as-of coordinate consistency) sits
    # under this key's version lifecycle
    "lake_incremental_mv",
    # Full coverage was reached in r7; the next-best use of the budget
    # is refreshing the STALEST evidence (r8 verdict task 6): the 37
    # keys whose only green is from round 1 — six rounds of engine
    # churn ago — plus 2 of the 5 round-3 stragglers (the other three
    # rotate in next round)
    "b_join_inner_group", "b_join_left_counts", "b_join_anti",
    "b_join_range", "b_join_interval_band",
    "b_setop_union_all", "b_setop_intersect", "b_setop_except",
    "b_distinct_agg", "b_having",
    "b_window_lag", "b_window_frame_sum",
    "b_cube", "b_grouping_sets",
    "b_expr_case_string", "b_datetime_fns", "b_math_fns",
    "b_json_extract",
    "b_subquery_exists", "b_subquery_scalar", "b_cte_query",
    "b_explode_array",
    "b2_setop_all_variants", "b2_limit_offset", "b2_sample_hash",
    "b2_summary_stats", "b2_join_full_outer", "b2_join_cross",
    "b2_percentiles", "b2_conditional_agg", "b2_string_agg",
    # New this round (priority (b): code added in r8) — the portable
    # mergeable-sketch family; displaces 3 stale keys to r9
    # (b2_levenshtein, b2_string_fns2, b2_regexp_extract, b2_date_fns2,
    # b2_null_fns, b2_window_ranks, b_rollup, b_higher_order_fns +
    # the r3 stragglers)
    "sketch_kmv_distinct", "sketch_kmv_union",
    "sketch_hll_estimate", "sketch_hll_windowed",
    "sketch_cms_heavy_hitters",
    "dedup_prefix_filter",
    "stream_hll_dau",
    "sketch_sampled_quantiles",
]


def _reorder(d: dict) -> dict:
    head = {k: d[k] for k in _HEAD if k in d}
    tail = {k: v for k, v in d.items() if k not in head}
    return {**head, **tail}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    missing = [k for k in _HEAD if k not in out]
    if missing:
        raise ValueError(f"_HEAD names unknown queries: {missing}")
    return _reorder(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return _reorder(out)
