"""Dump `.explain("formatted")` for the r17-optimization target queries.

Writes plans/r17/<query>_<tag>.txt for each named query (default: the
r17 optimization working set). The judge reads these as the
before/after plan evidence for OPTIMIZATION_r17.md.

Usage: python tools/r17_plans.py <tag> [query ...]
  tag: "before" | "after" (file suffix)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The queries examined/touched in the r17 optimization round.
DEFAULT_SET = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_prefix_filter",
    "dedup_lsh_index_probe",
    "sim_pca_topk",
    "dq_expectations",
    "sketch_bloom_semijoin",
    "graph_triangles",
    "dedup_substring",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_SET

    from quack_reduce_spark.inventory import all_queries
    from quack_reduce_spark.session import get_spark

    spark = get_spark(app_name="r17-plan-dump")
    queries = all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"r17 plan dump: {name}")
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
