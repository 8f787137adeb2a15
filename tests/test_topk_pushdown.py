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
