"""End-to-end invariants of the training-data curation pipeline."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_curation_invariants(spark, sf_dir, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.training_data_pipeline import QUALITY_MIN, curate

    curated = curate(spark, sf_dir)
    rows = curated.collect()
    assert rows, "fixture corpus must survive curation"

    # quality + language gates hold
    assert all(r["quality"] >= QUALITY_MIN for r in rows)

    # no exact duplicates survive (normalized text unique)
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))

    # strict subset of the input ids
    from quack_reduce_spark.sources import read_parquet_table

    all_ids = {
        r["doc_id"]
        for r in read_parquet_table(spark, f"{sf_dir}/documents.parquet").select("doc_id").collect()
    }
    assert {r["doc_id"] for r in rows} <= all_ids

    # partitioned write round-trips
    out = str(tmp_path / "curated")
    curated.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == len(rows)
    assert "lang" in back.columns


def test_streaming_pipeline_writes_finalized_windows(spark, sf_dir, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.streaming_pipeline import run

    n = run(sf_dir, str(tmp_path))
    # append mode emits only watermark-finalized windows: non-empty but
    # strictly fewer than the complete-mode window count
    assert n > 0
    import pyspark.sql.functions as F

    from quack_reduce_spark.inventory._util import load

    full = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
        .count()
    )
    assert n < full


def test_corpus_assembly_pipeline(spark, sf_dir, tmp_path):
    # end-to-end assembly: decontaminated + gated corpus sharded with a
    # consistent manifest, mixture weights sum to 1
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.corpus_assembly import assemble

    from quack_reduce_spark.engine import Engine

    eng = Engine(spark=spark)
    ordered, weights = assemble(spark, sf_dir)
    manifest = eng.write_sharded(
        ordered, str(tmp_path / "epoch0"), shard_by="doc_id", n_shards=16
    )
    n = ordered.count()
    assert manifest["total_rows"] == n and n > 100
    ws = [r["weight"] for r in weights.collect()]
    assert abs(sum(ws) - 1.0) < 1e-9 and all(w > 0 for w in ws)
    # eval docs (doc_id % 25 == 0) never appear in the training corpus
    assert ordered.filter("doc_id % 25 = 0").count() == 0


def test_ml_datamart_end_to_end(spark, sf_dir, tmp_path):
    """The round-5 composition: DQ gate -> hash split -> hashed
    features -> sharded/versioned delivery -> catalog round-trip."""
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.ml_datamart import build

    report = build(spark, sf_dir, str(tmp_path / "mart"))
    assert report["shards"] == 4
    assert set(report["cataloged"]) == {
        "train_features", "val_features", "test_features",
    }
    s = report["splits"]
    assert s["train"] > s["val"] and s["train"] > s["test"]
    assert report["train_feature_rows"] > 0
    assert report["winsor_cuts"][0] < report["winsor_cuts"][1]


def test_ann_audit_soundness(spark, sf_dir):
    """Both flavors of every approximate family are precision-1.0
    subsets of exact ground truth — the audit's exit-code contract."""
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.ann_audit import audit

    rows = audit(spark, sf_dir)
    assert {r["family"] for r in rows} == {"minhash_lsh", "embedding_sign_lsh"}
    for r in rows:
        assert r["prod_sound"] and r["port_sound"], r
        assert r["production"] > 0 and r["portable"] > 0
