"""Scale rehearsal: replicate the sf0.1 documents corpus 10x (with
shifted doc_ids, so replicas are near-dups of each other — the worst
case for dedup operators) and run the heavy dedup/curation operators
on ~50k docs / ~2.6M shingle rows. Verifies the operators survive a
10x scale step without plan degradation and records wall-clock.

Usage: python tools/scale_rehearsal.py [sf_dir] [replicas]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from quack_reduce_spark.operators import dedup as D  # noqa: E402
from quack_reduce_spark.session import get_spark  # noqa: E402
from quack_reduce_spark.sources import read_parquet_table  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale-rehearsal")
    base = read_parquet_table(spark, f"{sf}/documents.parquet")
    n_base = base.count()

    replicas = [
        base.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        for i in range(reps)
    ]
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionByName(r)
    big = big.repartition(32).localCheckpoint()  # materialize once; the
    # rehearsal measures the OPERATORS, not 10 re-reads of the parquet
    n_docs = big.count()
    print(f"corpus: {n_base} -> {n_docs} docs ({reps}x)")

    results = []

    t0 = time.time()
    n_exact = D.exact_dedup(big, "text", "doc_id").filter(F.col("n_copies") >= reps).count()
    results.append(("exact_dedup (groups with >= replicas copies)", n_exact, time.time() - t0))

    t0 = time.time()
    n_mh = D.minhash_lsh_pairs(big, "text", "doc_id", threshold=0.5).count()
    results.append(("minhash_lsh_pairs (>=0.5)", n_mh, time.time() - t0))

    t0 = time.time()
    n_cap = D.ngram_jaccard_pairs(
        big, "text", "doc_id", threshold=0.5, max_doc_freq=200
    ).count()
    results.append(("ngram_jaccard capped df<=200", n_cap, time.time() - t0))

    for label, n, secs in results:
        print(f"  {label}: {n} rows in {secs:.1f}s")

    # sanity: every doc duplicated across replicas must be found by
    # exact dedup (identical text) — groups == base corpus distinct texts
    distinct_texts = base.select(
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    ).distinct().count()
    assert n_exact == distinct_texts, (n_exact, distinct_texts)
    print(f"  sanity: {n_exact} full-replica groups == {distinct_texts} distinct texts")


if __name__ == "__main__":
    main()
