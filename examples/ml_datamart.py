"""Train-ready datamart — the round-5 operators composed end-to-end:
quality-gate the raw lake, split it reproducibly, vectorize, and leave
behind a cataloged, shard-delivered, schema-evolvable datamart a
trainer (or a teammate's session) attaches with one call.

  1. DQ gate          dq_expectations + dq_referential_integrity must
                      come back all-green before anything else runs
                      (a short-loaded partition poisons every stage
                      below — fail fast, loudly)
  2. split            deterministic md5-hash 80/10/10 train/val/test
                      (inventory/mlprep.py — survives repartitioning,
                      unlike randomSplit)
  3. vectorize        hashing-trick term→256-bucket features per doc
                      (no vocabulary object anywhere)
  4. robust stats     per-split winsorization cuts + fold audit, the
                      numbers a training run records next to its config
  5. delivery         train split → Engine.write_sharded (manifest
                      with per-shard counts); val/test → versioned
                      tables (time travel = eval-set provenance)
  6. catalog          Engine.save_catalog writes _catalog.json; a
                      FRESH engine re-attaches everything and re-runs
                      a spot check through the reloaded views

Every stage is DataFrame algebra; the only driver-side data are the
DQ verdict rows, the split/fold audit, and the manifest.

Run:  python examples/ml_datamart.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from quack_reduce_spark.engine import Engine
from quack_reduce_spark.inventory import dq, mlprep
from quack_reduce_spark.inventory.mlprep import _md5_bucket
from quack_reduce_spark.sources import read_parquet_table


def build(spark, sf_dir: str, out_dir: str) -> dict:
    eng = Engine(spark=spark)

    # 1. fail-fast data-quality gate
    failed = [
        r.check_name
        for r in dq.dq_expectations(spark, sf_dir).collect()
        if not r.passed
    ]
    broken = [
        r.relation
        for r in dq.dq_referential_integrity(spark, sf_dir).collect()
        if not r.intact
    ]
    if failed or broken:
        raise SystemExit(f"DQ gate failed: checks={failed} relations={broken}")

    docs = read_parquet_table(spark, f"{sf_dir}/documents.parquet")
    b = _md5_bucket(F.col("doc_id").cast("string"), 100)
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    tagged = docs.withColumn("split", split)

    # 3. hashing-trick features: per-doc (bucket, tf) pairs, kept long
    # form (the trainer's collate step densifies per batch)
    tok = tagged.select(
        "doc_id",
        "split",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
    ).filter(F.col("term") != "")
    feats = tok.withColumn("bucket", _md5_bucket(F.col("term"), 256)).groupBy(
        "doc_id", "split", "bucket"
    ).agg(F.count(F.lit(1)).alias("tf"))

    # 4. audit numbers
    split_audit = {
        (r.split, r.source): r.n_docs
        for r in mlprep.ml_train_split(spark, sf_dir).collect()
    }
    wins = mlprep.ml_winsorize(spark, sf_dir).collect()[0]

    # 5. delivery: train shards + versioned eval tables
    train = feats.filter(F.col("split") == "train").drop("split")
    manifest = eng.write_sharded(
        train, f"{out_dir}/train_features", shard_by="doc_id", n_shards=4
    )
    for name in ("val", "test"):
        eng.write_versioned(
            feats.filter(F.col("split") == name).drop("split"),
            f"{out_dir}/{name}_features",
            op="create",
        )

    # 6. catalog the datamart and prove a fresh session can use it
    eng.register("train_features", f"{out_dir}/train_features")
    eng.register("val_features", f"{out_dir}/val_features")
    eng.register("test_features", f"{out_dir}/test_features")
    eng.save_catalog(out_dir)

    fresh = Engine(spark=spark)
    names = fresh.load_catalog(out_dir)
    n_train = spark.sql("SELECT COUNT(*) AS n FROM train_features").collect()[0]["n"]
    n_val = spark.sql("SELECT COUNT(*) AS n FROM val_features").collect()[0]["n"]
    n_test = spark.sql("SELECT COUNT(*) AS n FROM test_features").collect()[0]["n"]
    assert n_train == manifest["total_rows"], (n_train, manifest)
    assert n_train > n_val and n_train > n_test

    return {
        "splits": {s: sum(v for (sp, _), v in split_audit.items() if sp == s)
                   for s in ("train", "val", "test")},
        "winsor_cuts": (wins.p01, wins.p99),
        "shards": manifest["n_files"],
        "train_feature_rows": n_train,
        "cataloged": names,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="qrs_datamart_"
    )
    from quack_reduce_spark.session import get_spark

    spark = get_spark(app_name="ml-datamart")
    report = build(spark, sf_dir, out_dir)
    print("datamart:", report)


if __name__ == "__main__":
    main()
