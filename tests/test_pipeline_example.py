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
