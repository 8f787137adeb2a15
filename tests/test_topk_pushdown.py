"""Top-k file pushdown (r15, VERDICT r14 #2): ``ORDER BY col DESC/ASC
LIMIT k`` over a zone-mapped table visits only the files the static
k-bound proves can contribute — the reference's own flagship artifact
shape (``top_pickup_locations.sql:8-9`` ends in ORDER BY 2 DESC LIMIT
200). The rebound plan still executes the full WHERE/ORDER/LIMIT, so
results are row-identical; these tests additionally pin the file
counts and the decline paths."""

from __future__ import annotations

import pyspark.sql.functions as F

from quack_reduce_spark.engine import Engine
from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.operators import zonemaps as Z


def _clustered(spark, sf_dir, tmp_path, name, n_files=8):
    src = str(tmp_path / name)
    (
        load(spark, sf_dir, "orders")
        .repartitionByRange(n_files, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(src)
    )
    Z.write_zonemap(spark, src, ["o_orderkey", "o_orderdate"])
    return src


def test_topk_desc_reads_few_files(spark, sf_dir, tmp_path):
    src = _clustered(spark, sf_dir, tmp_path, "tk1")
    eng = Engine(spark=spark)
    eng.register("tk1", src)
    full = spark.read.parquet(src)
    d = eng.df(
        "SELECT o_orderkey, o_totalprice FROM tk1 "
        "ORDER BY o_orderkey DESC LIMIT 5"
    )
    rep = eng.last_zonemap_report.get("tk1")
    assert rep is not None and "topk" in rep, eng.last_zonemap_report
    assert rep["topk"]["files_read"] < rep["topk"]["files_total"]
    assert rep["topk"]["files_read"] <= 2  # clustered: O(k/file) files
    got = [tuple(r) for r in d.collect()]
    want = [
        tuple(r)
        for r in full.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_orderkey").desc())
        .limit(5)
        .collect()
    ]
    assert got == want
    spark.catalog.dropTempView("tk1")


def test_topk_asc_and_where_composition(spark, sf_dir, tmp_path):
    src = _clustered(spark, sf_dir, tmp_path, "tk2")
    eng = Engine(spark=spark)
    eng.register("tk2", src)
    full = spark.read.parquet(src)
    mid = full.agg(F.expr("percentile_approx(o_orderkey, 0.5)")).first()[0]
    q = (
        f"SELECT o_orderkey FROM tk2 WHERE o_orderkey >= {int(mid)} "
        f"ORDER BY o_orderkey ASC LIMIT 7"
    )
    d = eng.df(q)
    rep = eng.last_zonemap_report.get("tk2")
    assert rep is not None and "topk" in rep, eng.last_zonemap_report
    # the bound composes with the WHERE pruning: strictly fewer files
    # than the range alone would keep
    assert rep["topk"]["files_read"] <= 2
    got = [r["o_orderkey"] for r in d.collect()]
    want = [
        r["o_orderkey"]
        for r in full.filter(F.col("o_orderkey") >= int(mid))
        .orderBy("o_orderkey")
        .limit(7)
        .collect()
    ]
    assert got == want
    spark.catalog.dropTempView("tk2")


def test_topk_declines_unclustered_and_stale(spark, sf_dir, tmp_path):
    """Unclustered layout: every file spans the key range, the bound
    skips nothing, the pushdown declines (results via the plain plan).
    Un-maintained append: the manifest can't be trusted, decline."""
    src = str(tmp_path / "tk3")
    load(spark, sf_dir, "orders").repartition(6).write.mode(
        "overwrite"
    ).parquet(src)
    Z.write_zonemap(spark, src, ["o_orderkey"])
    eng = Engine(spark=spark)
    eng.register("tk3", src)
    d = eng.df("SELECT o_orderkey FROM tk3 ORDER BY o_orderkey DESC LIMIT 5")
    rep = eng.last_zonemap_report.get("tk3")
    assert rep is None or "topk" not in rep
    full = spark.read.parquet(src)
    assert [r["o_orderkey"] for r in d.collect()] == [
        r["o_orderkey"]
        for r in full.orderBy(F.col("o_orderkey").desc()).limit(5).collect()
    ]
    # stale manifest: raw append bypassing maintenance
    src2 = _clustered(spark, sf_dir, tmp_path, "tk4", n_files=4)
    load(spark, sf_dir, "orders").limit(50).write.mode("append").parquet(src2)
    eng.register("tk4", src2)
    d2 = eng.df("SELECT o_orderkey FROM tk4 ORDER BY o_orderkey DESC LIMIT 5")
    rep2 = eng.last_zonemap_report.get("tk4")
    assert rep2 is None or "topk" not in rep2
    full2 = spark.read.parquet(src2)
    assert [r["o_orderkey"] for r in d2.collect()] == [
        r["o_orderkey"]
        for r in full2.orderBy(F.col("o_orderkey").desc()).limit(5).collect()
    ]
    spark.catalog.dropTempView("tk3")
    spark.catalog.dropTempView("tk4")


def test_topk_monotone_cast_alias_and_guards(spark, sf_dir, tmp_path):
    """r16 (VERDICT r15 #4): monotone-expression sort keys. (a) a
    CAST(ntz AS DATE) sort key resolved through the Project alias the
    analyzer hoists it into still prunes by the bound pushed through
    the chain; (b) session-zone-sensitive chains decline under a DST
    timezone (wall-clock order is not provably instant order); (c)
    negating a file whose min is the integer type's minimum declines
    (overflow: ANSI raises, legacy wraps non-monotonically)."""
    from quack_reduce_spark.plans import topk_pushdown as TK

    src = str(tmp_path / "tk7")
    (
        load(spark, sf_dir, "orders")
        .repartitionByRange(6, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(src)
    )
    Z.write_zonemap(spark, src, ["o_orderdate"])
    eng = Engine(spark=spark)
    eng.register("tk7", src)
    full = spark.read.parquet(src)
    d = eng.df(
        "SELECT CAST(o_orderdate AS DATE) AS d, o_orderkey FROM tk7 "
        "ORDER BY d DESC, o_orderkey DESC LIMIT 5"
    )
    rep = eng.last_zonemap_report.get("tk7")
    assert rep is not None and "topk" in rep, eng.last_zonemap_report
    assert rep["topk"]["sort_expr_steps"] == ["to_date"]
    assert rep["topk"]["files_read"] < rep["topk"]["files_total"]
    want = [
        tuple(r)
        for r in full.selectExpr(
            "CAST(o_orderdate AS DATE) AS d", "o_orderkey"
        )
        .orderBy(F.col("d").desc(), F.col("o_orderkey").desc())
        .limit(5)
        .collect()
    ]
    assert [tuple(r) for r in d.collect()] == want

    # (b) DST session zone: the tz-gated chain declines, plain plan
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        eng.df(
            "SELECT o_orderkey FROM tk7 ORDER BY "
            "date_trunc('month', o_orderdate) DESC, o_orderkey DESC LIMIT 5"
        )
        rep2 = eng.last_zonemap_report.get("tk7")
        assert rep2 is None or "topk" not in rep2
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    spark.catalog.dropTempView("tk7")

    # (c) integer-min negation: the guard declines the whole pushdown
    src2 = str(tmp_path / "tk8")
    (
        spark.createDataFrame(
            [(-(2 ** 63), 1), (5, 2), (9, 3)], "v long, id int"
        )
        .repartitionByRange(2, "v")
        .sortWithinPartitions("v")
        .write.mode("overwrite")
        .parquet(src2)
    )
    Z.write_zonemap(spark, src2, ["v"])
    spark.read.parquet(src2).createOrReplaceTempView("tk8")
    df8 = spark.sql("SELECT v, id FROM tk8 ORDER BY -v ASC, id LIMIT 1")
    info = TK.extract_topk(df8, {"tk8": src2})
    assert info is not None and info["flip"] is True
    assert TK.plan_topk_files(spark, src2, ["v"], info) is None
    spark.catalog.dropTempView("tk8")


def test_topk_asc_string_sentinel_collision(spark, tmp_path):
    """r16 (r15 ADVICE): the ASC all-values-lose marker is an identity
    object compared with ``is``. A string sort column whose computed
    bound happens to EQUAL the old literal string
    '__ALL_VALUES_LOSE__' must take the NORMAL exclusion branch — the
    old string-equality compare dropped every zero-null file,
    including the one holding the actual top-k rows."""
    src = str(tmp_path / "tk6")
    spark.createDataFrame(
        [("__ALL_VALUES_LOSE__",)] * 10, "s string"
    ).repartition(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame([("zzz",)] * 10, "s string").repartition(
        1
    ).write.mode("append").parquet(src)
    Z.write_zonemap(spark, src, ["s"])
    eng = Engine(spark=spark)
    eng.register("tk6", src)
    d = eng.df("SELECT s FROM tk6 ORDER BY s ASC LIMIT 5")
    got = [r["s"] for r in d.collect()]
    # '_' < 'z': the five smallest ARE the sentinel-valued rows
    assert got == ["__ALL_VALUES_LOSE__"] * 5
    rep = eng.last_zonemap_report.get("tk6")
    assert rep is not None and "topk" in rep, eng.last_zonemap_report
    assert rep["topk"]["files_read"] == 1  # the 'zzz' file is excluded
    spark.catalog.dropTempView("tk6")


def test_topk_nulls_and_ties_are_exact(spark, tmp_path):
    """DESC NULLS LAST: all-NULL / below-bound files are excludable
    but NULL rows surface once k exceeds the non-null count — the
    bound then fails to prove k rows and declines (plain plan, exact).
    ASC NULLS FIRST: null-bearing files are NEVER excluded, and sure
    nulls count toward k. Ties at the bound survive (strict-inequality
    exclusion only)."""
    rows = (
        [(i, i // 10) for i in range(100)]          # v 0..99, clustered
        + [(100 + i, None) for i in range(20)]      # a null tail
    )
    df = spark.createDataFrame(rows, "id long, v long")
    src = str(tmp_path / "tk5")
    (
        df.repartitionByRange(6, F.col("v").asc_nulls_last())
        .sortWithinPartitions(F.col("v").asc_nulls_last())
        .write.mode("overwrite")
        .parquet(src)
    )
    Z.write_zonemap(spark, src, ["v", "id"])
    eng = Engine(spark=spark)
    eng.register("tk5", src)
    full = spark.read.parquet(src)

    def run(q):
        d = eng.df(q)
        rep = eng.last_zonemap_report.get("tk5")
        return d, rep

    # DESC: top 5 by v (ties broken by id) — few files
    d, rep = run("SELECT id, v FROM tk5 ORDER BY v DESC, id LIMIT 5")
    want = [
        tuple(r)
        for r in full.orderBy(F.col("v").desc(), "id").limit(5).collect()
    ]
    assert [tuple(r) for r in d.collect()] == want
    assert rep is not None and "topk" in rep and rep["topk"]["files_read"] < 6

    # DESC with k > non-null rows: NULLS LAST rows must surface — the
    # bound can't prove k non-null rows, so it declines; exact anyway
    d, rep = run("SELECT id, v FROM tk5 ORDER BY v DESC, id LIMIT 110")
    want = [
        tuple(r)
        for r in full.orderBy(F.col("v").desc(), "id").limit(110).collect()
    ]
    assert [tuple(r) for r in d.collect()] == want

    # ASC NULLS FIRST: nulls sort first; null-bearing files kept, and
    # with k <= the sure-null count every zero-null file is excludable
    d, rep = run("SELECT id, v FROM tk5 ORDER BY v ASC, id LIMIT 5")
    want = [
        tuple(r)
        for r in full.orderBy(F.col("v").asc(), "id").limit(5).collect()
    ]
    assert [tuple(r) for r in d.collect()] == want
    if rep is not None and "topk" in rep:
        assert rep["topk"]["files_read"] < 6
    spark.catalog.dropTempView("tk5")
