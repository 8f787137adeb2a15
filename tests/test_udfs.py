"""UDF surface: import-without-session safety, scalar/grouped-agg
pandas UDFs, UDTF lateral fan-out."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_module_imports_without_session():
    # lazy typing: importing must not require an active SparkSession
    import importlib

    import quack_reduce_spark.functions.udfs as u

    importlib.reload(u)


def test_sigmoid_midpoint_and_monotonic(spark):
    from quack_reduce_spark.functions.udfs import sigmoid_calibrate

    df = spark.createDataFrame([(0.0,), (0.5,), (1.0,)], "q double")
    vals = [r["s"] for r in df.select(sigmoid_calibrate("q").alias("s")).orderBy("q").collect()]
    assert abs(vals[1] - 0.5) < 1e-12
    assert vals[0] < vals[1] < vals[2]


def test_trimmed_mean_drops_extremes(spark):
    from quack_reduce_spark.functions.udfs import trimmed_mean

    rows = [(1, float(v)) for v in [0, 0, 1, 2, 3, 4, 100, 100]]
    df = spark.createDataFrame(rows, "k long, v double")
    got = df.groupBy("k").agg(trimmed_mean("v").alias("tm")).collect()[0]["tm"]
    assert got == (1 + 2 + 3 + 4) / 4  # extremes trimmed

    small = spark.createDataFrame([(1, 1.0), (1, 3.0)], "k long, v double")
    got_small = small.groupBy("k").agg(trimmed_mean("v").alias("tm")).collect()[0]["tm"]
    assert got_small == 2.0  # <= 4 values: plain mean


def test_udtf_fanout_positions(spark):
    from quack_reduce_spark.functions.udfs import register_udfs

    register_udfs(spark)
    spark.createDataFrame([(1, "a b  c"), (2, None)], "id long, text string").createOrReplaceTempView(
        "__udtf_t"
    )
    rows = spark.sql(
        "SELECT id, u.pos, u.token FROM __udtf_t, LATERAL tokenize_udtf(text) u"
    ).collect()
    assert {(r["id"], r["pos"], r["token"]) for r in rows} == {(1, 0, "a"), (1, 1, "b"), (1, 2, "c")}
