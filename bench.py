"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], warmup + N timed
repetitions each, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Mirrors the reference's benchmark structure (warm runs, mean over
repetitions — /root/reference/src/benchmark.py:49-124), recast for
Spark: the reference's three deployment modes collapse into one
engine whose physical plan already is the partition-parallel
partial/final aggregation the reference hand-rolled.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# Headline set: the flagship reference-shaped query + one per operator
# family (agg battery, star join, windows, time-series, text, dedup,
# similarity). Everything runs lazily and is forced with a count-style
# action so timing covers full execution, not driver-side collect size.
HEADLINE = [
    "a09_topk",
    "b_agg_pricing_summary",
    "b_join_star_broadcast",
    "b_window_rank",
    "ts_session_window",
    "ts_asof_join",
    "text_quality",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "tpch_q9_product_type_profit",
    "tpch_q21_suppliers_who_kept_waiting",
    # round 4 additions (keep above list stable for r-over-r deltas;
    # totals across rounds compare on the original 12)
    "text_decontaminate",
    "text_bm25_topk",
]


def main() -> None:
    from quack_reduce_spark.inventory import all_queries
    from quack_reduce_spark.session import get_spark

    spark = get_spark(app_name="quack-reduce-bench")
    queries = all_queries()

    results: dict[str, float] = {}
    mins: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        fn(spark, SF_DIR).count()  # warmup: plan + fill fs caches
        times = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            times.append(time.time() - t0)
        results[name] = round(statistics.mean(times), 3)
        mins[name] = round(min(times), 3)

    # the headline metric stays the ORIGINAL 12-query total so the
    # round-over-round comparison is apples-to-apples; the round-4
    # additions report per-query only
    core = HEADLINE[:12]
    total = round(sum(results[k] for k in core), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_mean_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                # min-of-reps per query: the noise floor on a shared
                # machine (mean is the headline; a mean far above min
                # flags contention, not plan cost)
                "queries_min": mins,
                "total_min": round(sum(mins[k] for k in core), 3),
                "sf": SF_DIR,
                "reps": REPS,
            }
        )
    )


if __name__ == "__main__":
    main()
