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
    # Stable sentinels — Tier A + one per family, driver-green 8 rounds
    "a01_scan_project", "a09_topk",
    "b_join_star_broadcast",
    "tpch_q1_full",
    "ts_asof_join",
    "stream_tumbling_agg",
    "text_quality",
    "dedup_lsh_index_probe",
    "sim_cosine_topk",
    "graph_triangles",
    # Code changed this round (r9): OCC lock-break token check +
    # pre-flip lease re-check (lake.py), KMV salt-tree adaptive fanout
    # (plan change under the kmv keys), shared prefix candidate join
    "lake_incremental_mv",
    "sketch_kmv_distinct", "sketch_kmv_union",
    "dedup_prefix_filter",
    # New in r9 — theta set expressions, fixed-size sample quantiles,
    # append-mode (watermark-evicting) streaming HLL, HLL register
    # merge rollup, bloom semi-join pre-filter
    "sketch_theta_intersect",
    "sketch_topn_sample_quantiles",
    "stream_hll_dau_append",
    "sketch_hll_union",
    "sketch_bloom_semijoin",
    "sketch_join_cardinality",
    # New in r9 (late): file-level zone-map data skipping + A-ES
    # weighted sampling
    "lake_zonemap_skipping",
    "ml_weighted_sample",
    "stream_cms_topk",
    "ml_target_encode",
    # r8 ADVICE: sim_lsh_topk's buckets changed when the hyperplanes
    # were Gram-Schmidt-orthogonalized; it is rows-only (no oracle —
    # a deliberate one-slot exception to the no-rows-only-head rule)
    # so this sample re-baselines its row count for continuity
    "sim_lsh_topk",
    # Stalest-evidence fill: the six r1-era string/date keys and five
    # r3 stragglers owed from the r8 rotation, then 21 of the 40
    # r4-era keys (Tier A remainder, core Tier B, the heavy TPC-H
    # composites, and the ts_ windows); the remaining r4 keys (plus
    # tpch_q8/q9/q18/q21, displaced by the late r9 feature slots) rotate into r10
    "b2_levenshtein", "b2_string_fns2", "b2_regexp_extract",
    "b2_date_fns2", "b2_null_fns", "b2_window_ranks",
    "b_rollup", "b_higher_order_fns", "b2_pivot",
    "b3_extreme_aggs", "text_fingerprint",
    "a02_hive_partition_scan", "a04_filter_range",
    "a05_projection_expr", "a06_group_count", "a07_global_count",
    "a14_derived_date",
    "b_agg_pricing_summary", "b_join_semi", "b_window_rank",
    "b3_window_qualify",
    "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q6_forecast_revenue",
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
