"""Wide-decimal (p > 18) manifest stats (round 14, VERDICT r13 #5):
no unscaled-long space exists past 18 digits, so decimal(38,s) columns
stat NATIVELY — parquet decimal min/max, exact decimal strings in the
list doc, python-Decimal driver comparisons, BigDecimal-exact literal
decoding. SUM/AVG still decline by design (38-digit per-file sums can
overflow silently)."""

from __future__ import annotations

import decimal as D

import pyspark.sql.functions as F

from quack_reduce_spark.engine import Engine
from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.operators import zonemaps as Z


def _table(spark, sf_dir, tmp_path, name, clustered=True):
    src = str(tmp_path / name)
    orders = load(spark, sf_dir, "orders").withColumn(
        "price", F.col("o_totalprice").cast("decimal(38,4)")
    )
    w = (
        orders.repartitionByRange(8, "price").sortWithinPartitions("price")
        if clustered
        else orders.repartition(8)
    )
    w.write.mode("overwrite").parquet(src)
    Z.write_zonemap(spark, src, ["price"])
    return src


def test_wide_decimal_range_pruning_and_agg(spark, sf_dir, tmp_path):
    src = _table(spark, sf_dir, tmp_path, "dw1")
    eng = Engine(spark=spark)
    eng.register("dw1", src)
    full = spark.read.parquet(src)
    r = eng.df(
        "SELECT COUNT(*) AS n, MIN(price) AS mn, MAX(price) AS mx "
        "FROM dw1 WHERE price >= 5000.0000 AND price < 100000.0000"
    ).first()
    plan = eng.last_agg_plan
    assert plan is not None and plan["files_scanned"] <= 2, plan
    w = (
        full.filter(
            (F.col("price") >= D.Decimal("5000.0000"))
            & (F.col("price") < D.Decimal("100000.0000"))
        )
        .agg(F.count(F.lit(1)), F.min("price"), F.max("price"))
        .first()
    )
    assert (r["n"], r["mn"], r["mx"]) == (w[0], w[1], w[2])
    # SUM of a wide decimal DECLINES (no exact mergeable partial)
    eng.df("SELECT SUM(price) AS s FROM dw1").collect()
    assert eng.last_agg_plan is None
    spark.catalog.dropTempView("dw1")


def test_wide_decimal_in_and_point(spark, sf_dir, tmp_path):
    src = _table(spark, sf_dir, tmp_path, "dw2")
    eng = Engine(spark=spark)
    eng.register("dw2", src)
    full = spark.read.parquet(src)
    key = full.select("price").orderBy("price").offset(300).limit(1).first()[0]
    r = eng.df(f"SELECT COUNT(*) AS n FROM dw2 WHERE price = {key}").first()
    assert r["n"] == full.filter(F.col("price") == key).count()
    rep = eng.last_zonemap_report.get("dw2") or {}
    pruned = rep.get("agg_pushdown", {}).get(
        "files_pruned_in", rep.get("files_read")
    )
    assert pruned is not None and pruned <= 2, rep  # clustered point hit
    # 12-value IN routes through the InSet dump parser
    vals = ", ".join(f"{1000 + 13 * i}.25" for i in range(12))
    r2 = eng.df(f"SELECT COUNT(*) AS n FROM dw2 WHERE price IN ({vals})").first()
    w2 = full.filter(
        F.col("price").isin([D.Decimal(f"{1000 + 13 * i}.25") for i in range(12)])
    ).count()
    assert r2["n"] == w2
    spark.catalog.dropTempView("dw2")


def test_wide_decimal_count_where_and_group_minmax(spark, sf_dir, tmp_path):
    src = _table(spark, sf_dir, tmp_path, "dw3")
    eng = Engine(spark=spark)
    eng.register("dw3", src)
    full = spark.read.parquet(src)
    n = eng.count_where(
        "dw3", {"price": (D.Decimal("1000.0050"), D.Decimal("50000.0000"))}
    )
    assert eng.last_count_plan["source"] == "metadata+residual"
    assert n == full.filter(
        (F.col("price") >= D.Decimal("1000.0050"))
        & (F.col("price") <= D.Decimal("50000.0000"))
    ).count()
    # grouped MIN/MAX over a wide decimal VALUE (hive layout pins keys)
    src2 = str(tmp_path / "dw3g")
    load(spark, sf_dir, "orders").withColumn(
        "price", F.col("o_totalprice").cast("decimal(38,4)")
    ).write.partitionBy("o_orderstatus").mode("overwrite").parquet(src2)
    Z.write_zonemap(spark, src2, ["o_orderstatus", "price"])
    eng.register("dw3g", src2)
    d = eng.df(
        "SELECT o_orderstatus AS st, MIN(price) AS mn, MAX(price) AS mx "
        "FROM dw3g GROUP BY o_orderstatus"
    )
    plan = eng.last_agg_plan
    assert plan is not None and plan["files_scanned"] == 0, plan
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src2)
            .groupBy(F.col("o_orderstatus").alias("st"))
            .agg(F.min("price").alias("mn"), F.max("price").alias("mx"))
            .collect(),
        )
    )
    assert got == want
    spark.catalog.dropTempView("dw3")
    spark.catalog.dropTempView("dw3g")
