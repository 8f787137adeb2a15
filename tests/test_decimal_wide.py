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
    # SUM of a wide decimal ANSWERS from metadata as of r15 (native
    # decimal per-file sums, exact python-Decimal fold) — and equals
    # the plain plan exactly
    s = eng.df("SELECT SUM(price) AS s FROM dw1").first()["s"]
    assert eng.last_agg_plan is not None
    assert eng.last_agg_plan["files_scanned"] == 0
    assert s == full.agg(F.sum("price")).first()[0]
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


def test_wide_decimal_sum_avg_pushdown_exact(spark, sf_dir, tmp_path):
    """r15 (VERDICT r14 #5): SUM/AVG over decimal(38,4) answer from
    per-file native-decimal sums folded driver-side in exact
    python-Decimal space — equal to the plain plan bit-for-bit,
    including Spark's decimal-Average rounding (sum cast to the s+4
    result type BEFORE the divide)."""
    src = str(tmp_path / "dws")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(38,4)").alias("p")
    )
    orders.repartitionByRange(5, "o_orderkey").write.mode("overwrite").parquet(src)
    Z.write_zonemap(spark, src, ["o_orderkey", "p"])
    eng = Engine(spark=spark)
    eng.register("dws", src)
    full = spark.read.parquet(src)
    full.createOrReplaceTempView("dws_plain")
    for where in (
        "",
        " WHERE o_orderkey >= 1000 AND o_orderkey < 4000",
    ):
        q = f"SELECT SUM(p) AS s, AVG(p) AS a, COUNT(p) AS n FROM dws{where}"
        got = eng.df(q).first()
        tele = eng.last_agg_plan
        assert tele is not None, q
        want = spark.sql(q.replace(" dws", " dws_plain")).first()
        assert got == want, (got, want)
    spark.catalog.dropTempView("dws")
    spark.catalog.dropTempView("dws_plain")


def test_wide_decimal_sum_overflow_adversarial(spark, tmp_path):
    """Values near 10^33 at scale 4: (a) per-FILE sums that overflow
    decimal(38,4) null out via try_sum and the pushdown DECLINES —
    never a silently wrong total; (b) large-but-representable totals
    fold exactly, verified against python-Decimal ground truth."""
    import decimal as D

    # (b) representable: 30 rows of ~2.5e32, total 7.5e33 < 10^34
    big = D.Decimal("25" + "0" * 31 + ".0000")  # 2.5e32 at scale 4
    rows = [(i, big + D.Decimal(i).scaleb(-4)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, p decimal(38,4)")
    src = str(tmp_path / "dov_ok")
    df.repartitionByRange(4, "id").write.mode("overwrite").parquet(src)
    Z.write_zonemap(spark, src, ["id", "p"])
    eng = Engine(spark=spark)
    eng.register("dov_ok", src)
    got = eng.df("SELECT SUM(p) AS s FROM dov_ok").first()["s"]
    tele = eng.last_agg_plan
    assert tele is not None and tele["files_scanned"] == 0, tele
    want = sum((p for _i, p in rows), D.Decimal(0))
    assert got == want
    # (a) per-file overflow: a single file whose sum tops 38 digits —
    # try_sum records NULL, the fold sees a non-all-null NULL sum and
    # declines; the engine runs the plain plan (which raises under
    # ANSI, exactly like a user's direct query — never a quiet wrong
    # answer from metadata)
    huge = D.Decimal(10) ** 33  # 20 rows x 1e33 = 2e34 > 10^34 capacity
    rows2 = [(i, huge) for i in range(20)]
    df2 = spark.createDataFrame(rows2, "id long, p decimal(38,4)")
    src2 = str(tmp_path / "dov_bad")
    df2.coalesce(1).write.mode("overwrite").parquet(src2)
    Z.write_zonemap(spark, src2, ["id", "p"])
    stats = {
        r["file"]: r.asDict()
        for r in Z.read_zonemap(spark, src2).collect()
    }
    assert all(v["sum_p"] is None for v in stats.values()), stats
    eng.register("dov_bad", src2)
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    d = eng.df("SELECT SUM(p) AS s FROM dov_bad")
    tele = eng.last_agg_plan
    # the metadata path must NOT have answered (sum unavailable)
    assert tele is None or tele["files_scanned"] > 0, tele
    with pytest.raises(Exception):
        d.collect()  # ANSI overflow, same as the plain plan
    spark.catalog.dropTempView("dov_ok")
    spark.catalog.dropTempView("dov_bad")
