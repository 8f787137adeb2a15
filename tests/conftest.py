from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from quack_reduce_spark.session import configure

    return (
        configure(
            SparkSession.builder.appName("tests").master("local[4]"),
            shuffle_partitions=4,
        )
        .getOrCreate()
    )


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _bound_jvm_heap_between_modules():
    """Keep cumulative driver-heap growth bounded across the single-JVM
    full-suite run: localCheckpoint blocks are only reclaimed when the
    driver GC collects their RDD references (ContextCleaner is weak-ref
    driven), so dozens of heavy modules back to back can accumulate
    hundreds of MBs of dead blocks and eventually abort a late task.
    After each module, drop cached relations and force one JVM GC so
    the cleaner runs — the late-suite py4j flake this prevents showed
    up ~25 min in while the same test passed isolated."""
    yield
    spark = SparkSession.getActiveSession()
    if spark is None:
        return
    try:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass  # teardown hygiene is best-effort; never fail a module
