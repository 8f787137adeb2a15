"""Training-data curation pipeline — the north-star LLM-data flow
end-to-end on the engine's own operators.

Stages (each a lazy DataFrame; one Spark job materializes the output):

  1. ingest      documents.parquet (text + lang + binary payload)
  2. clean       whitespace-normalize, drop empty docs
  3. analyze     token counts (whitespace + BPE-ish), quality score,
                 language ID — all JVM-side expressions
  4. dedup       exact (rolling-hash fingerprint groupBy keeps one
                 copy) then near-dup (MinHash-LSH pairs -> drop the
                 higher doc_id of every confirmed pair)
  5. filter      quality >= threshold AND predicted language == 'en'
  6. write       hive-partitioned by lang bucket, ready for a
                 downstream tokenizer fleet

Scale shape: stages 2-5 are narrow transformations + two aggregation
shuffles (fingerprint groupBy, LSH band groupBy) and one candidate
join — no collect(), no driver-side loop; the write is partitioned so
a 1000-executor run lays files out in parallel.

Run:  python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from quack_reduce_spark.functions import text as T
from quack_reduce_spark.operators import dedup as D
from quack_reduce_spark.session import get_spark
from quack_reduce_spark.sources import read_parquet_table

QUALITY_MIN = 0.5


def curate(spark, sf_dir: str):
    """documents -> curated training corpus DataFrame (lazy)."""
    docs = read_parquet_table(spark, f"{sf_dir}/documents.parquet")

    cleaned = docs.select(
        "doc_id",
        "lang",
        F.regexp_replace(F.trim(F.col("text")), r"\s+", " ").alias("text"),
    ).filter(F.length("text") > 0)

    analyzed = cleaned.select(
        "*",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        T.quality_score(F.col("text")).alias("quality"),
        T.lang_id(F.col("text")).alias("pred_lang"),
        T.rolling_hash(F.col("text")).alias("fp"),
        T.mean_token_len(F.col("text")).alias("mean_word_len"),
    )

    # Gopher-style document gate (inventory/text2.py bounds): word-count
    # band + mean-word-length band, applied before any shuffle so the
    # rejected docs never enter the dedup joins
    analyzed = analyzed.filter(
        (F.col("n_tokens") >= 40)
        & (F.col("n_tokens") <= 100_000)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
    )

    # exact dedup: one survivor per fingerprint (min doc_id wins)
    survivors = analyzed.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    exact_deduped = analyzed.join(survivors, ["fp", "doc_id"], "inner")

    # near-dedup: MinHash-LSH confirmed pairs -> drop the newer doc
    pairs = D.minhash_lsh_pairs(exact_deduped, "text", "doc_id", threshold=0.5)
    losers = pairs.select(F.col("doc2").alias("doc_id")).distinct()
    near_deduped = exact_deduped.join(losers, "doc_id", "left_anti")

    return near_deduped.filter(
        (F.col("quality") >= QUALITY_MIN) & (F.col("pred_lang") == "en")
    ).select("doc_id", "lang", "text", "n_tokens", "n_bpe_tokens", "quality")


def run(sf_dir: str, out_dir: str) -> None:
    spark = get_spark(app_name="training-data-pipeline")
    curated = curate(spark, sf_dir)
    curated.write.mode("overwrite").partitionBy("lang").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    n_in = read_parquet_table(spark, f"{sf_dir}/documents.parquet").count()
    n_out = back.count()
    toks = back.agg(F.sum("n_tokens")).collect()[0][0]
    print(f"curated {n_in} -> {n_out} docs ({toks} tokens) at {out_dir}")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curated_")
    run(sf, out)
