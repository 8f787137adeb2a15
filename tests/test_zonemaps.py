"""File-level zone maps (operators/zonemaps.py): manifest stats,
pruned-scan == full-filter equality on every layout, pruning power on
clustered layouts, NULL-file handling, and z-order synergy (pruning on
EITHER dimension of a Morton-clustered write)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.operators import zonemaps as Z
from quack_reduce_spark.operators.zorder import zorder_write


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def sorted_layout(spark, sf_dir, tmp_path_factory):
    """Orders clustered by o_orderdate into 12 files — tight per-file
    date ranges, the layout zone maps are built for."""
    path = str(tmp_path_factory.mktemp("zm") / "orders_sorted")
    orders = load(spark, sf_dir, "orders")
    (
        orders.repartitionByRange(12, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    n = Z.write_zonemap(spark, path, ["o_orderdate", "o_totalprice"])
    assert n == 12
    return path


@pytest.fixture(scope="module")
def random_layout(spark, sf_dir, tmp_path_factory):
    """Same rows hash-scattered across 12 files — the adversarial
    layout: zone maps must stay CORRECT (equality) even when they
    cannot prune."""
    path = str(tmp_path_factory.mktemp("zm") / "orders_random")
    orders = load(spark, sf_dir, "orders")
    orders.repartition(12, "o_orderkey").write.mode("overwrite").parquet(path)
    Z.write_zonemap(spark, path, ["o_orderdate", "o_totalprice"])
    return path


def test_manifest_stats_consistent(spark, sf_dir, sorted_layout):
    zm = Z.read_zonemap(spark, sorted_layout)
    total = load(spark, sf_dir, "orders").count()
    agg = zm.agg(
        F.sum("n_rows").alias("n"),
        F.min("min_o_orderdate").alias("lo"),
        F.max("max_o_orderdate").alias("hi"),
    ).collect()[0]
    assert agg["n"] == total
    bad = zm.filter(F.col("min_o_orderdate") > F.col("max_o_orderdate")).count()
    assert bad == 0
    # hidden dir: a table scan must NOT see the manifest
    assert spark.read.parquet(sorted_layout).count() == total


@pytest.mark.parametrize("layout", ["sorted_layout", "random_layout"])
def test_pruned_scan_equals_full_filter(spark, layout, request):
    path = request.getfixturevalue(layout)
    lo, hi = dt.datetime(1998, 1, 1), dt.datetime(1998, 6, 30)
    got, _, _ = Z.scan_pruned(spark, path, "o_orderdate", lo, hi)
    want = spark.read.parquet(path).filter(
        (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") <= F.lit(hi))
    )
    assert _rows(got.select("o_orderkey")) == _rows(want.select("o_orderkey"))


def test_clustered_layout_prunes(spark, sorted_layout):
    lo, hi = dt.datetime(1998, 1, 1), dt.datetime(1998, 6, 30)
    _, read, total = Z.scan_pruned(spark, sorted_layout, "o_orderdate", lo, hi)
    assert total == 12
    assert read <= 3, (read, total)  # ~6 months of a ~7-year span


def test_one_sided_ranges(spark, sorted_layout):
    df_lo, read_lo, _ = Z.scan_pruned(
        spark, sorted_layout, "o_orderdate", lo=dt.datetime(1999, 1, 1)
    )
    full = spark.read.parquet(sorted_layout)
    want = full.filter(F.col("o_orderdate") >= F.lit(dt.datetime(1999, 1, 1)))
    assert df_lo.count() == want.count()
    assert read_lo <= 6  # ~3 of the ~7 spanned years (fixture: 1995-2001)
    df_hi, _, _ = Z.scan_pruned(
        spark, sorted_layout, "o_orderdate", hi=dt.datetime(1995, 12, 31)
    )
    want_hi = full.filter(F.col("o_orderdate") <= F.lit(dt.datetime(1995, 12, 31)))
    assert df_hi.count() == want_hi.count()


def test_all_null_file_pruned_and_correct(spark, tmp_path):
    """A file whose stats column is entirely NULL has NULL min/max in
    the manifest; a range scan must skip it (range predicates cannot
    match NULL) and still return exactly the matching rows."""
    path = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k int, v double"
    ).repartition(2, "k")
    nulls = spark.createDataFrame([(i,) for i in range(100, 150)], "k int").select(
        "k", F.lit(None).cast("double").alias("v")
    ).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    nulls.write.mode("append").parquet(path)
    Z.write_zonemap(spark, path, ["v"])
    got, read, total = Z.scan_pruned(spark, path, "v", 10.0, 20.0)
    assert total == 3
    assert read <= 2  # the all-NULL file never survives planning
    assert sorted(r["k"] for r in got.collect()) == list(range(10, 21))


def test_empty_survivor_set(spark, sorted_layout):
    got, read, _ = Z.scan_pruned(
        spark, sorted_layout, "o_orderdate", lo=dt.datetime(2050, 1, 1)
    )
    assert read == 0
    assert got.count() == 0
    # schema is preserved even with zero surviving files
    assert "o_orderstatus" in got.columns


def test_zorder_synergy_prunes_both_dims(spark, sf_dir, tmp_path):
    """The composition the module docstring promises: a Morton-
    clustered write gives every file a tight 2-D bounding box, so a
    selective range on EITHER column alone skips files — where the
    single-column sorted layout prunes only its own column."""
    path = str(tmp_path / "orders_z")
    orders = load(spark, sf_dir, "orders")
    zorder_write(orders, path, "o_custkey", "o_totalprice", n_files=16)
    Z.write_zonemap(spark, path, ["o_custkey", "o_totalprice"])
    ck = orders.approxQuantile("o_custkey", [0.4, 0.6], 0.01)
    tp = orders.approxQuantile("o_totalprice", [0.4, 0.6], 0.01)
    _, read_a, total = Z.scan_pruned(spark, path, "o_custkey", ck[0], ck[1])
    _, read_b, _ = Z.scan_pruned(spark, path, "o_totalprice", tp[0], tp[1])
    assert total == 16
    assert read_a < total, (read_a, total)
    assert read_b < total, (read_b, total)
    # and both pruned scans still agree with the full filter
    got, _, _ = Z.scan_pruned(spark, path, "o_totalprice", tp[0], tp[1])
    want = spark.read.parquet(path).filter(F.col("o_totalprice").between(tp[0], tp[1]))
    assert _rows(got.select("o_orderkey")) == _rows(want.select("o_orderkey"))
