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
