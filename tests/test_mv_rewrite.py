"""Materialized-view query rewrite (round 13): an aggregate query over
a table with a registered FRESH MV re-plans over the MV's partials —
the warehouse answer to the reference dashboard re-running identical
aggregates per widget refresh (``dashboard.py:37-39``). Half these
tests are DECLINE tests: predicates off the group column, partials the
MV doesn't carry, and stale MVs must all run the plain plan and stay
correct."""

from __future__ import annotations

import pyspark.sql.functions as F

from quack_reduce_spark.engine import Engine
from quack_reduce_spark.inventory._util import load

MV_Q = (
    "SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS s, "
    "COUNT(o_orderkey) AS nk, MIN(o_orderkey) AS mn, "
    "MAX(o_orderkey) AS mx FROM {t} GROUP BY o_orderstatus"
)


def _setup(spark, sf_dir, tmp_path, name):
    src = str(tmp_path / f"{name}_src")
    load(spark, sf_dir, "orders").write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register(name, src)
    eng.create_materialized_view(
        f"{name}_mv", MV_Q.format(t=name), str(tmp_path / f"{name}_mv")
    )
    return eng, src


def test_mv_rewrite_grouped_and_scalar(spark, sf_dir, tmp_path):
    """Same-group queries and scalar aggregates (with predicates on
    the group column only) rewrite over the MV — row-identical to
    plain execution, and the physical plan reads ONLY the MV."""
    eng, src = _setup(spark, sf_dir, tmp_path, "mvt")
    full = spark.read.parquet(src)
    d = eng.df(
        "SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS s, "
        "AVG(o_orderkey) AS a FROM mvt GROUP BY o_orderstatus"
    )
    tele = eng.last_mv_rewrite
    assert tele is not None and tele["view"] == "mvt_mv" and tele["grouped"]
    files = d.inputFiles()
    assert files and all("mvt_mv" in f for f in files)  # MV only, no src
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            full.groupBy("o_orderstatus").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").alias("s"),
                F.avg("o_orderkey").alias("a"),
            ).collect(),
        )
    )
    assert got == want
    # scalar over the grouped MV, predicate on the group column
    r = eng.df(
        "SELECT COUNT(*) AS n, MIN(o_orderkey) AS mn FROM mvt "
        "WHERE o_orderstatus = 'F'"
    ).first()
    assert eng.last_mv_rewrite is not None
    w = full.filter(F.col("o_orderstatus") == "F").agg(
        F.count(F.lit(1)), F.min("o_orderkey")
    ).first()
    assert tuple(r) == tuple(w)
    # fully-filtered scalar: COUNT is 0, SUM is NULL (SQL semantics)
    r0 = eng.df(
        "SELECT COUNT(*) AS n, SUM(o_orderkey) AS s FROM mvt "
        "WHERE o_orderstatus = 'ZZ'"
    ).first()
    assert eng.last_mv_rewrite is not None
    assert r0["n"] == 0 and r0["s"] is None
    spark.catalog.dropTempView("mvt")


def test_mv_rewrite_declines(spark, sf_dir, tmp_path):
    """Outside the exactness gates the query runs plain: predicates
    off the group column, aggregates whose partials the MV lacks
    (AVG needs SUM+COUNT of the same column), DISTINCT, a different
    grouping, and a different table."""
    eng, src = _setup(spark, sf_dir, tmp_path, "mvd")
    full = spark.read.parquet(src)
    # predicate off the group column
    r = eng.df(
        "SELECT COUNT(*) AS n FROM mvd WHERE o_orderkey > 100"
    ).first()
    assert eng.last_mv_rewrite is None
    assert r["n"] == full.filter(F.col("o_orderkey") > 100).count()
    # partial the MV lacks: AVG(o_custkey) has no sum/count columns
    r2 = eng.df("SELECT AVG(o_custkey) AS a FROM mvd").first()
    assert eng.last_mv_rewrite is None
    assert abs(r2["a"] - full.agg(F.avg("o_custkey")).first()[0]) < 1e-9
    # different grouping column
    eng.df(
        "SELECT o_orderpriority, COUNT(*) AS n FROM mvd "
        "GROUP BY o_orderpriority"
    ).collect()
    assert eng.last_mv_rewrite is None
    # DISTINCT never extracts
    eng.df("SELECT COUNT(DISTINCT o_orderkey) AS n FROM mvd").first()
    assert eng.last_mv_rewrite is None
    spark.catalog.dropTempView("mvd")


def test_mv_rewrite_staleness_refresh_adoption(spark, sf_dir, tmp_path):
    """An append after materialization no longer kills the rewrite:
    the stale MV COMPENSATES — partials union an aggregate over only
    the delta files — and returns exactly the live table's answer. A
    second engine adopts the persisted MV via _mv.json and rewrites
    too."""
    eng, src = _setup(spark, sf_dir, tmp_path, "mvs")
    q = "SELECT o_orderstatus, COUNT(*) AS n FROM mvs GROUP BY o_orderstatus"
    eng.df(q).collect()
    assert eng.last_mv_rewrite is not None
    assert "compensation_delta_files" not in eng.last_mv_rewrite
    # append WITHOUT refresh: the rewrite survives via compensation
    # and reflects the appended rows (the live table, exactly what a
    # fresh full materialization would serve)
    load(spark, sf_dir, "orders").limit(7).write.mode("append").parquet(src)
    got = sorted(map(tuple, eng.df(q).collect()))
    assert eng.last_mv_rewrite is not None
    assert eng.last_mv_rewrite["compensation_delta_files"] >= 1
    live_want = sorted(
        map(
            tuple,
            spark.read.parquet(src).groupBy("o_orderstatus").count().collect(),
        )
    )
    assert got == live_want
    # re-register (live file listing) + refresh: plain (uncompensated)
    # rewrites resume, reflecting the appended rows
    eng.register("mvs", src)
    eng.refresh_materialized_view("mvs_mv")
    got2 = sorted(map(tuple, eng.df(q).collect()))
    assert eng.last_mv_rewrite is not None
    assert "compensation_delta_files" not in eng.last_mv_rewrite
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src).groupBy("o_orderstatus").count().collect(),
        )
    )
    assert got2 == want
    # adoption by a fresh engine over the same lake
    eng2 = Engine(spark=spark)
    eng2.register("mvs", src)
    eng2.register_materialized_view("adopted", str(tmp_path / "mvs_mv"))
    got3 = sorted(map(tuple, eng2.df(q).collect()))
    assert eng2.last_mv_rewrite is not None
    assert eng2.last_mv_rewrite["view"] == "adopted"
    assert got3 == want
    spark.catalog.dropTempView("mvs")


def test_mv_creation_rejects_unsupported_shapes(spark, sf_dir, tmp_path):
    """Creation is stricter than rewrite: AVG, COUNT(DISTINCT) — whose
    partial does not merge — expression aggregates, and key-only
    queries all refuse with a clear error. (A WHERE clause is allowed
    since r14: see test_mv_predicate_containment.)"""
    import pytest

    src = str(tmp_path / "mvr_src")
    load(spark, sf_dir, "orders").write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvr", src)
    bad = [
        "SELECT o_orderstatus, AVG(o_orderkey) AS a FROM mvr "
        "GROUP BY o_orderstatus",
        "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS d FROM mvr "
        "GROUP BY o_orderstatus",
        "SELECT o_orderstatus, SUM(o_orderkey + 1) AS s FROM mvr "
        "GROUP BY o_orderstatus",
        "SELECT o_orderstatus FROM mvr GROUP BY o_orderstatus",
    ]
    for q in bad:
        with pytest.raises(ValueError):
            eng.create_materialized_view("nope", q, str(tmp_path / "nope"))
    spark.catalog.dropTempView("mvr")


def test_mv_rewrite_null_group_and_agg_pushdown_priority(spark, tmp_path):
    """The SQL NULL group round-trips through the MV, and when the
    source table carries a FRESH zone-map manifest the metadata agg
    pushdown (zero/boundary file reads) wins over the MV rewrite."""
    from quack_reduce_spark.operators import zonemaps as Z

    src = str(tmp_path / "mvn_src")
    spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3)], "k string, v long"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvn", src)
    eng.create_materialized_view(
        "mvn_mv",
        "SELECT k, COUNT(*) AS n, SUM(v) AS s, COUNT(v) AS nv "
        "FROM mvn GROUP BY k",
        str(tmp_path / "mvn_mv"),
    )
    got = {
        r["k"]: (r["n"], r["a"])
        for r in eng.df(
            "SELECT k, COUNT(*) AS n, AVG(v) AS a FROM mvn GROUP BY k"
        ).collect()
    }
    assert eng.last_mv_rewrite is not None
    assert got == {"a": (1, 1.0), None: (2, 2.5)}
    # manifest beats MV: zone-mapped source answers from metadata
    Z.write_zonemap(spark, src, ["k", "v"])
    eng.register("mvn", src)  # re-register to pick up the manifest
    eng.df("SELECT k, COUNT(*) AS n FROM mvn GROUP BY k").collect()
    assert eng.last_agg_plan is not None  # metadata path fired
    spark.catalog.dropTempView("mvn")

def test_mv_rollup_rewrite(spark, sf_dir, tmp_path):
    """ROLLUP containment: a query grouping by a SUBSET of the MV's
    keys (any order, or none) re-aggregates the finer partials, with
    predicates allowed on ANY MV group column — even one the query's
    coarser grouping rolls away."""
    src = str(tmp_path / "roll_src")
    load(spark, sf_dir, "orders").write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("roll", src)
    eng.create_materialized_view(
        "roll_mv",
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, "
        "SUM(o_orderkey) AS s, COUNT(o_orderkey) AS nk, "
        "MIN(o_orderkey) AS mn FROM roll "
        "GROUP BY o_orderstatus, o_orderpriority",
        str(tmp_path / "roll_mv"),
    )
    full = spark.read.parquet(src)
    # coarser grouping + predicate on the rolled-away key
    d = eng.df(
        "SELECT o_orderstatus AS st, COUNT(*) AS n, AVG(o_orderkey) AS a, "
        "MIN(o_orderkey) AS mn FROM roll "
        "WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderstatus"
    )
    assert eng.last_mv_rewrite is not None
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            full.filter(F.col("o_orderpriority") == "1-URGENT")
            .groupBy(F.col("o_orderstatus").alias("st"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.avg("o_orderkey").alias("a"),
                F.min("o_orderkey").alias("mn"),
            )
            .collect(),
        )
    )
    assert got == want
    # exact grouping, keys in the other order
    d2 = eng.df(
        "SELECT o_orderpriority AS pr, o_orderstatus AS st, COUNT(*) AS n "
        "FROM roll GROUP BY o_orderpriority, o_orderstatus"
    )
    assert eng.last_mv_rewrite is not None
    g2 = sorted(map(tuple, d2.collect()))
    w2 = sorted(
        map(
            tuple,
            full.groupBy(
                F.col("o_orderpriority").alias("pr"),
                F.col("o_orderstatus").alias("st"),
            ).count().collect(),
        )
    )
    assert g2 == w2
    # scalar rollup over the two-key MV
    r = eng.df("SELECT COUNT(*) AS n FROM roll WHERE o_orderstatus = 'F'")
    assert eng.last_mv_rewrite is not None
    assert r.first()["n"] == full.filter(
        F.col("o_orderstatus") == "F"
    ).count()
    # grouping off the MV's key set still declines
    eng.df("SELECT o_custkey, COUNT(*) AS n FROM roll GROUP BY o_custkey").collect()
    assert eng.last_mv_rewrite is None
    spark.catalog.dropTempView("roll")

def test_mv_incremental_refresh(spark, sf_dir, tmp_path):
    """Append-only incremental maintenance: the delta files are
    aggregated alone and merged into the existing partials — exact
    (counts/sums add, mins/maxes fold) and equal to a full recompute;
    'noop' when nothing changed; a REMOVED file (shrinkage no merge
    can express) falls back to a full recompute."""
    import os

    src = str(tmp_path / "incr_src")
    mvp = str(tmp_path / "incr_mv")
    orders = load(spark, sf_dir, "orders")
    orders.write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("incr", src)
    eng.create_materialized_view(
        "incr_mv",
        "SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS s, "
        "COUNT(o_orderkey) AS nk, MIN(o_orderkey) AS mn, "
        "MAX(o_orderkey) AS mx FROM incr GROUP BY o_orderstatus",
        mvp,
    )
    orders.filter(F.col("o_orderkey") <= 500).write.mode("append").parquet(src)
    tele = eng.refresh_materialized_view("incr_mv", incremental=True)
    assert tele["mode"] == "incremental" and tele["delta_files"] >= 1
    live = spark.read.parquet(src)
    want = sorted(
        map(
            tuple,
            live.groupBy("o_orderstatus").agg(
                F.count(F.lit(1)),
                F.sum("o_orderkey"),
                F.count("o_orderkey"),
                F.min("o_orderkey"),
                F.max("o_orderkey"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(mvp).select(
                "o_orderstatus", "n__star", "sum__o_orderkey",
                "count__o_orderkey", "min__o_orderkey", "max__o_orderkey",
            ).collect(),
        )
    )
    assert got == want
    # the refreshed MV serves rewrites over the live binding
    eng.register("incr", src)
    d = eng.df(
        "SELECT o_orderstatus, COUNT(*) AS n FROM incr GROUP BY o_orderstatus"
    )
    assert eng.last_mv_rewrite is not None
    assert sorted(map(tuple, d.collect())) == sorted(
        map(tuple, live.groupBy("o_orderstatus").count().collect())
    )
    assert eng.refresh_materialized_view("incr_mv", incremental=True)[
        "mode"
    ] == "noop"
    # shrinkage: removed file -> full recompute
    victim = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    os.remove(os.path.join(src, victim))
    eng.register("incr", src)
    assert eng.refresh_materialized_view("incr_mv", incremental=True)[
        "mode"
    ] == "full"
    spark.catalog.dropTempView("incr")

def test_mv_rewrite_order_by_limit(spark, sf_dir, tmp_path):
    """Sort/Limit peel + re-apply on the MV path: the top-k dashboard
    query rewrites over the MV and returns exactly the plain rows."""
    eng, src = _setup(spark, sf_dir, tmp_path, "mvtk")
    full = spark.read.parquet(src)
    d = eng.df(
        "SELECT o_orderstatus AS st, COUNT(*) AS n FROM mvtk "
        "GROUP BY o_orderstatus ORDER BY n DESC, st LIMIT 2"
    )
    assert eng.last_mv_rewrite is not None
    got = [tuple(r) for r in d.collect()]
    want = [
        tuple(r)
        for r in full.groupBy(F.col("o_orderstatus").alias("st"))
        .count()
        .orderBy(F.col("count").desc(), F.col("st"))
        .limit(2)
        .collect()
    ]
    assert got == want
    spark.catalog.dropTempView("mvtk")

def test_mv_bucket_granularity_rollup(spark, sf_dir, tmp_path):
    """A MONTHLY-bucket MV answers monthly, yearly, and scalar
    queries (each fine bucket maps to exactly one coarse bucket —
    function-composition containment over the date lattice); a WHERE
    on the raw source column declines (no plain key to filter); the
    incremental refresh buckets delta rows through the same key
    expressions."""
    src = str(tmp_path / "bros_src")
    load(spark, sf_dir, "orders").write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("bros", src)
    meta = eng.create_materialized_view(
        "bros_mv",
        "SELECT trunc(o_orderdate,'month') AS m, COUNT(*) AS n, "
        "SUM(o_orderkey) AS s, COUNT(o_orderkey) AS nk, "
        "MIN(o_orderkey) AS mn FROM bros GROUP BY 1",
        str(tmp_path / "bros_mv"),
    )
    assert meta["groups"][0]["kind"] == "trunc_month"
    full = spark.read.parquet(src)
    # yearly over monthly: rebucketed rollup with AVG from sum+count
    d = eng.df(
        "SELECT year(o_orderdate) AS y, COUNT(*) AS n, "
        "AVG(o_orderkey) AS a, MIN(o_orderkey) AS mn FROM bros "
        "GROUP BY 1 ORDER BY y"
    )
    assert eng.last_mv_rewrite is not None
    got = [tuple(r) for r in d.collect()]
    want = [
        tuple(r)
        for r in full.groupBy(
            F.year(F.col("o_orderdate").cast("date")).alias("y")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("o_orderkey").alias("a"),
            F.min("o_orderkey").alias("mn"),
        )
        .orderBy("y")
        .collect()
    ]
    assert got == want
    # exact monthly + scalar both rewrite
    eng.df(
        "SELECT trunc(o_orderdate,'month') AS m, COUNT(*) AS n "
        "FROM bros GROUP BY 1"
    ).collect()
    assert eng.last_mv_rewrite is not None
    assert eng.df("SELECT COUNT(*) AS n FROM bros").first()["n"] == full.count()
    assert eng.last_mv_rewrite is not None
    # raw-column predicate: no plain key -> decline, stay correct
    import datetime as dt

    r = eng.df(
        "SELECT COUNT(*) AS n FROM bros "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01'"
    ).first()
    assert eng.last_mv_rewrite is None
    assert r["n"] == full.filter(
        F.col("o_orderdate")
        >= F.lit(dt.datetime(1996, 1, 1)).cast("timestamp_ntz")
    ).count()
    # incremental refresh buckets the delta through the same keys
    load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= 300
    ).write.mode("append").parquet(src)
    assert eng.refresh_materialized_view("bros_mv", incremental=True)[
        "mode"
    ] == "incremental"
    eng.register("bros", src)
    live = spark.read.parquet(src)
    d2 = eng.df(
        "SELECT year(o_orderdate) AS y, COUNT(*) AS n FROM bros "
        "GROUP BY 1 ORDER BY y"
    )
    assert eng.last_mv_rewrite is not None
    assert [tuple(r) for r in d2.collect()] == [
        tuple(r)
        for r in live.groupBy(
            F.year(F.col("o_orderdate").cast("date")).alias("y")
        ).count().orderBy("y").collect()
    ]
    spark.catalog.dropTempView("bros")


def test_mv_predicate_containment(spark, sf_dir, tmp_path):
    """Predicate-bearing MVs (the reference's own dbt model is a
    filtered aggregate view, trips_by_pickup_location.sql:1-6): a
    CREATE with WHERE stores the canonical conjuncts; queries rewrite
    only when their predicate CONTAINS the MV's, with the residual
    re-applied over plain MV keys; non-contained predicates decline."""
    src = str(tmp_path / "mvp_src")
    load(spark, sf_dir, "orders").write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvp", src)
    meta = eng.create_materialized_view(
        "mvp_mv",
        "SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS s "
        "FROM mvp WHERE o_orderkey > 1000 GROUP BY o_orderstatus",
        str(tmp_path / "mvp_mv"),
    )
    assert meta["conjuncts"]  # the predicate is part of the spec
    full = spark.read.parquet(src)
    base = full.filter(F.col("o_orderkey") > 1000)
    # exact same predicate: rewrite, zero residual
    d = eng.df(
        "SELECT o_orderstatus, COUNT(*) AS n FROM mvp "
        "WHERE o_orderkey > 1000 GROUP BY o_orderstatus"
    )
    assert eng.last_mv_rewrite is not None
    assert eng.last_mv_rewrite["mv_predicate"] is True
    assert sorted(map(tuple, d.collect())) == sorted(
        map(tuple, base.groupBy("o_orderstatus").count().collect())
    )
    # contained predicate + residual on a plain group key
    r = eng.df(
        "SELECT COUNT(*) AS n, SUM(o_orderkey) AS s FROM mvp "
        "WHERE o_orderkey > 1000 AND o_orderstatus = 'F'"
    ).first()
    assert eng.last_mv_rewrite is not None
    w = base.filter(F.col("o_orderstatus") == "F").agg(
        F.count(F.lit(1)), F.sum("o_orderkey")
    ).first()
    assert tuple(r) == tuple(w)
    # NON-contained: wider predicate (no MV conjunct) must decline
    r2 = eng.df("SELECT COUNT(*) AS n FROM mvp").first()
    assert eng.last_mv_rewrite is None
    assert r2["n"] == full.count()
    # NON-contained: different bound on the same column
    r3 = eng.df(
        "SELECT COUNT(*) AS n FROM mvp WHERE o_orderkey > 500"
    ).first()
    assert eng.last_mv_rewrite is None
    assert r3["n"] == full.filter(F.col("o_orderkey") > 500).count()
    # contained + residual OFF the group keys: decline (cannot re-apply)
    r4 = eng.df(
        "SELECT COUNT(*) AS n FROM mvp "
        "WHERE o_orderkey > 1000 AND o_custkey > 10"
    ).first()
    assert eng.last_mv_rewrite is None
    assert r4["n"] == base.filter(F.col("o_custkey") > 10).count()
    spark.catalog.dropTempView("mvp")


def test_mv_predicate_incremental_refresh(spark, sf_dir, tmp_path):
    """Incremental refresh of a predicate-bearing MV applies the MV's
    WHERE to the delta files before merging — equal to a full
    recompute."""
    src = str(tmp_path / "mvpi_src")
    mvp = str(tmp_path / "mvpi_mv")
    orders = load(spark, sf_dir, "orders")
    orders.write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvpi", src)
    eng.create_materialized_view(
        "mvpi_mv",
        "SELECT o_orderstatus, COUNT(*) AS n FROM mvpi "
        "WHERE o_orderkey > 1000 GROUP BY o_orderstatus",
        mvp,
    )
    orders.filter(F.col("o_orderkey") <= 2000).write.mode("append").parquet(src)
    tele = eng.refresh_materialized_view("mvpi_mv", incremental=True)
    assert tele["mode"] == "incremental"
    live = spark.read.parquet(src).filter(F.col("o_orderkey") > 1000)
    want = sorted(map(tuple, live.groupBy("o_orderstatus").count().collect()))
    got = sorted(
        map(
            tuple,
            spark.read.parquet(mvp)
            .select("o_orderstatus", "n__star")
            .collect(),
        )
    )
    assert got == want
    spark.catalog.dropTempView("mvpi")


def test_mv_compensation_declines_on_rewrite(spark, sf_dir, tmp_path):
    """Compensation is APPEND-ONLY: an overwrite of the source (a
    recorded file disappears / changes) declines the rewrite entirely
    — a shrunk table has no union that can compensate."""
    eng, src = _setup(spark, sf_dir, tmp_path, "mvcd")
    q = "SELECT o_orderstatus, COUNT(*) AS n FROM mvcd GROUP BY o_orderstatus"
    eng.df(q).collect()
    assert eng.last_mv_rewrite is not None
    # OVERWRITE (not append): recorded files vanish
    load(spark, sf_dir, "orders").limit(50).write.mode("overwrite").parquet(src)
    eng.register("mvcd", src)  # bind the view to the live (shrunk) set
    got = sorted(map(tuple, eng.df(q).collect()))
    assert eng.last_mv_rewrite is None  # no compensation, plain plan
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src).groupBy("o_orderstatus").count().collect(),
        )
    )
    assert got == want
    spark.catalog.dropTempView("mvcd")


def test_mv_creation_binds_live_source(spark, sf_dir, tmp_path):
    """ADVICE r13: creating (or fully refreshing) an MV after an
    append that the registered view has NOT been rebound to must
    materialize from the LIVE table — the creation path re-registers
    the source so the materialized rows and the stamped snapshot
    describe the same state."""
    src = str(tmp_path / "mvlb_src")
    orders = load(spark, sf_dir, "orders")
    orders.write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvlb", src)
    # append AFTER registration, WITHOUT re-registering
    orders.limit(9).write.mode("append").parquet(src)
    eng.create_materialized_view(
        "mvlb_mv",
        "SELECT o_orderstatus, COUNT(*) AS n FROM mvlb GROUP BY o_orderstatus",
        str(tmp_path / "mvlb_mv"),
    )
    d = eng.df(
        "SELECT o_orderstatus, COUNT(*) AS n FROM mvlb GROUP BY o_orderstatus"
    )
    assert eng.last_mv_rewrite is not None
    assert "compensation_delta_files" not in eng.last_mv_rewrite  # fresh
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src).groupBy("o_orderstatus").count().collect(),
        )
    )
    assert sorted(map(tuple, d.collect())) == want
    spark.catalog.dropTempView("mvlb")


def test_mv_versioned_source_commit_never_serves_stale(spark, tmp_path):
    """r15: an MV over a VERSIONED table records the immutable version
    dir it aggregated; after a maintenance commit the registered view
    re-resolves to a NEW version dir while the recorded one stays
    byte-stable — matching by table name alone would keep serving the
    pre-commit aggregate marked fresh forever. The rewrite must
    decline (resolved path != recorded source_path) and the query run
    plain over the live version."""
    eng = Engine(spark=spark)
    path = str(tmp_path / "mv_ver")
    base = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", i * 10) for i in range(10)],
        "k long, grp string, val long",
    )
    eng.write_versioned(base, path, op="create")
    eng.register("tver", path)
    mv_path = str(tmp_path / "mv_ver_mv")
    eng.create_materialized_view(
        "mv_ver", "SELECT grp, SUM(val) AS s FROM tver GROUP BY grp", mv_path
    )
    q = "SELECT grp, SUM(val) AS s FROM tver GROUP BY grp"
    eng.df(q)
    assert eng.last_mv_rewrite is not None, "fresh MV must rewrite"
    # maintenance commit: data CHANGES (upsert), pointer flips to a new
    # version dir; the old dir (the MV's source_path) is untouched
    updates = spark.createDataFrame(
        [(0, "a", 99999)], "k long, grp string, val long"
    )
    eng.merge_upsert(path, updates, key="k")
    got = {r["grp"]: r["s"] for r in eng.df(q).collect()}
    want = {
        r["grp"]: r["s"]
        for r in eng.read_table(path)
        .groupBy("grp")
        .agg(F.sum("val").alias("s"))
        .collect()
    }
    assert got == want, "post-commit answer must reflect the upsert"
    spark.catalog.dropTempView("tver")


def test_mv_survives_optimize_without_manual_refresh(
    spark, sf_dir, tmp_path
):
    """r15 (VERDICT r14 #4): create MV -> append -> optimize. The
    compaction invalidates compensation (correct — partials can
    shrink), but the maintenance hook marks the MV and the NEXT query
    self-refreshes it: the rewrite fires again with no manual
    refresh_materialized_view call, values exact."""
    src = str(tmp_path / "mvlc")
    load(spark, sf_dir, "orders").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvlc", src)
    mv_path = str(tmp_path / "mvlc_mv")
    eng.create_materialized_view(
        "mvlc_mv",
        "SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS s "
        "FROM mvlc GROUP BY o_orderstatus",
        mv_path,
    )
    load(spark, sf_dir, "orders").limit(300).repartition(2).write.mode(
        "append"
    ).parquet(src)
    eng.register("mvlc", src)
    eng.optimize(src, cluster_by=["o_orderkey"], target_rows_per_file=50_000)
    eng.register("mvlc", src)
    q = (
        "SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS s "
        "FROM mvlc GROUP BY o_orderstatus"
    )
    d = eng.df(q)
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
            .collect(),
        )
    )
    assert got == want
    # the rewrite must be ALIVE again post-self-refresh (the agg
    # pushdown may answer first on a manifested table; force the MV
    # path by checking its stamped state instead): the MV's recorded
    # snapshot now matches the live source
    from quack_reduce_spark.plans import mv_rewrite as MVR

    mv = eng._mvs["mvlc_mv"]
    assert not mv.get("needs_refresh")
    assert MVR.source_snapshot(mv["source_path"]) == mv["snapshot"]
    spark.catalog.dropTempView("mvlc")


def test_mv_restamps_after_compact_when_fresh(spark, sf_dir, tmp_path):
    """A row-preserving compact of a FRESH MV's source re-stamps the
    MV in place (no recompute, no decline): the very next query
    rewrites."""
    src = str(tmp_path / "mvrs")
    load(spark, sf_dir, "orders").repartition(6).write.mode(
        "overwrite"
    ).parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvrs", src)
    mv_path = str(tmp_path / "mvrs_mv")
    eng.create_materialized_view(
        "mvrs_mv",
        "SELECT o_orderpriority, COUNT(*) AS n FROM mvrs "
        "GROUP BY o_orderpriority",
        mv_path,
    )
    eng.compact(src, target_rows_per_file=100_000)
    eng.register("mvrs", src)
    q = "SELECT o_orderpriority, COUNT(*) AS n FROM mvrs GROUP BY o_orderpriority"
    d = eng.df(q)
    assert eng.last_mv_rewrite is not None, "re-stamped MV must rewrite"
    assert not eng._mvs["mvrs_mv"].get("needs_refresh")
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src).groupBy("o_orderpriority").count().collect(),
        )
    )
    assert got == want
    spark.catalog.dropTempView("mvrs")


def test_mv_versioned_maintenance_self_refreshes(spark, tmp_path):
    """Versioned source: a merge_upsert flips the pointer to a new
    version dir; the hook marks the MV and the next query
    self-refreshes it onto the LIVE version (full recompute — no
    incremental contract across a re-resolution), so the rewrite is
    alive again with post-merge values."""
    eng = Engine(spark=spark)
    path = str(tmp_path / "mvvm")
    base = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", i * 10) for i in range(10)],
        "k long, grp string, val long",
    )
    eng.write_versioned(base, path, op="create")
    eng.register("mvvm", path)
    mv_path = str(tmp_path / "mvvm_mv")
    eng.create_materialized_view(
        "mvvm_mv", "SELECT grp, SUM(val) AS s FROM mvvm GROUP BY grp", mv_path
    )
    updates = spark.createDataFrame(
        [(0, "a", 100000)], "k long, grp string, val long"
    )
    eng.merge_upsert(path, updates, key="k")
    q = "SELECT grp, SUM(val) AS s FROM mvvm GROUP BY grp"
    d = eng.df(q)
    got = {r["grp"]: r["s"] for r in d.collect()}
    assert got["a"] == sum(i * 10 for i in range(2, 10, 2)) + 100000
    # second query: the refreshed MV now rewrites against the live dir
    eng.df(q)
    assert eng.last_mv_rewrite is not None
    spark.catalog.dropTempView("mvvm")


def test_mv_predicate_bucket_incremental_refresh_reads_delta_only(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r16 (VERDICT r15 #6): incremental refresh of a WHERE-bearing,
    bucket-keyed MV merges from the DELTA FILES ALONE — the refresh-
    COST assertion: the delta-partials builder receives exactly the
    appended files, the full-recompute path is never taken, and the
    merged MV equals a from-scratch recompute of the filtered bucket
    aggregate."""
    import os

    from quack_reduce_spark.plans import mv_rewrite as MV

    src = str(tmp_path / "mvinc_src")
    mvp = str(tmp_path / "mvinc_mv")
    orders = load(spark, sf_dir, "orders")
    orders.repartition(3).write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvinc", src)
    eng.create_materialized_view(
        "mvinc_mv",
        "SELECT trunc(o_orderdate,'month') AS m, COUNT(*) AS n, "
        "SUM(o_orderkey) AS s FROM mvinc WHERE o_orderkey > 1000 "
        "GROUP BY 1",
        mvp,
    )
    before = set(spark.read.parquet(src).inputFiles())
    orders.limit(200).repartition(2).write.mode("append").parquet(src)
    after = set(spark.read.parquet(src).inputFiles())

    def norm(p):
        if p.startswith("file:"):
            p = p[len("file:"):]
            while p.startswith("//"):
                p = p[1:]
        from urllib.parse import unquote

        return os.path.realpath(unquote(p))

    delta = {norm(p) for p in after} - {norm(p) for p in before}
    assert len(delta) == 2
    seen: list[list[str]] = []
    real = MV.delta_partial_frame

    def spy(spark_, mv, files):
        seen.append(list(files))
        return real(spark_, mv, files)

    monkeypatch.setattr(MV, "delta_partial_frame", spy)

    def no_full(*a, **k):
        raise AssertionError(
            "incremental refresh fell back to a full recompute"
        )

    monkeypatch.setattr(Engine, "create_materialized_view", no_full)
    tele = eng.refresh_materialized_view("mvinc_mv", incremental=True)
    assert tele["mode"] == "incremental" and tele["delta_files"] == 2
    assert len(seen) == 1
    assert {norm(p) for p in seen[0]} == delta
    monkeypatch.undo()
    live = spark.read.parquet(src).filter("o_orderkey > 1000")
    want = sorted(
        map(
            tuple,
            live.groupBy(F.trunc("o_orderdate", "month").alias("m"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").alias("s"),
            )
            .collect(),
        )
    )
    got = sorted(map(tuple, spark.read.parquet(mvp).collect()))
    assert got == want
    spark.catalog.dropTempView("mvinc")


def test_mv_predicate_bucket_rollup_composition(spark, sf_dir, tmp_path):
    """r15 (VERDICT r14 #6): a WHERE-bearing MV keyed by
    trunc(d,'month') serves the YEARLY rollup with the same predicate
    (residual-free containment is bucket-independent) — including when
    the predicate is on the bucket SOURCE column itself; a genuine
    residual on the bucket source declines (it does not commute with
    the bucketing)."""
    src = str(tmp_path / "mvbp")
    load(spark, sf_dir, "orders").write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvbp", src)
    full = spark.read.parquet(src)
    mv1 = str(tmp_path / "mvbp_mv1")
    eng.create_materialized_view(
        "mvbp_m1",
        "SELECT trunc(o_orderdate,'month') AS m, COUNT(*) AS n, "
        "SUM(o_custkey) AS s FROM mvbp WHERE o_orderstatus = 'F' "
        "GROUP BY 1",
        mv1,
    )
    q = (
        "SELECT trunc(o_orderdate,'year') AS y, COUNT(*) AS n, "
        "SUM(o_custkey) AS s FROM mvbp WHERE o_orderstatus = 'F' GROUP BY 1"
    )
    d = eng.df(q)
    assert eng.last_mv_rewrite is not None
    assert eng.last_mv_rewrite["mv_predicate"] is True
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            full.filter("o_orderstatus = 'F'")
            .groupBy(F.trunc("o_orderdate", "year").alias("y"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("o_custkey").alias("s"))
            .collect(),
        )
    )
    assert got == want
    # predicate on the bucket SOURCE column, month-aligned: rewrites
    mv2 = str(tmp_path / "mvbp_mv2")
    eng.create_materialized_view(
        "mvbp_m2",
        "SELECT trunc(o_orderdate,'month') AS m, COUNT(*) AS n FROM mvbp "
        "WHERE o_orderdate >= DATE'1995-01-01' GROUP BY 1",
        mv2,
    )
    d2 = eng.df(
        "SELECT trunc(o_orderdate,'year') AS y, COUNT(*) AS n FROM mvbp "
        "WHERE o_orderdate >= DATE'1995-01-01' GROUP BY 1"
    )
    assert eng.last_mv_rewrite is not None
    assert eng.last_mv_rewrite["view"] == "mvbp_m2"
    got2 = sorted(map(tuple, d2.collect()))
    want2 = sorted(
        map(
            tuple,
            full.filter("o_orderdate >= DATE'1995-01-01'")
            .groupBy(F.trunc("o_orderdate", "year").alias("y"))
            .count()
            .collect(),
        )
    )
    assert got2 == want2
    # genuine residual on the bucket source: decline, plain plan exact
    d3 = eng.df(
        "SELECT trunc(o_orderdate,'year') AS y, COUNT(*) AS n FROM mvbp "
        "WHERE o_orderdate >= DATE'1995-03-15' GROUP BY 1"
    )
    assert eng.last_mv_rewrite is None
    got3 = sorted(map(tuple, d3.collect()))
    want3 = sorted(
        map(
            tuple,
            full.filter("o_orderdate >= DATE'1995-03-15'")
            .groupBy(F.trunc("o_orderdate", "year").alias("y"))
            .count()
            .collect(),
        )
    )
    assert got3 == want3
    spark.catalog.dropTempView("mvbp")


def test_mv_refresh_mark_persists_across_engines(spark, sf_dir, tmp_path):
    """The maintenance mark survives in _mv.json: a SECOND engine that
    adopts the MV after the maintenance (a restart) self-refreshes on
    its first query instead of declining until a manual refresh."""
    import json as _json

    src = str(tmp_path / "mvpm")
    load(spark, sf_dir, "orders").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvpm", src)
    mv_path = str(tmp_path / "mvpm_mv")
    eng.create_materialized_view(
        "mvpm_mv",
        "SELECT o_orderstatus, COUNT(*) AS n FROM mvpm GROUP BY 1",
        mv_path,
    )
    load(spark, sf_dir, "orders").limit(100).write.mode("append").parquet(src)
    eng.register("mvpm", src)
    eng.compact(src, target_rows_per_file=100_000)
    # the mark is ON DISK (pre-fresh was false: the append drifted it)
    doc = _json.loads(open(f"{mv_path}/_mv.json").read())
    assert doc.get("needs_refresh") is True
    # a FRESH engine adopts the persisted MV and self-refreshes
    eng2 = Engine(spark=spark)
    eng2.register("mvpm", src)
    eng2.register_materialized_view("mvpm_mv", mv_path)
    d = eng2.df(
        "SELECT o_orderstatus, COUNT(*) AS n FROM mvpm GROUP BY 1"
    )
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src).groupBy("o_orderstatus").count().collect(),
        )
    )
    assert got == want
    doc2 = _json.loads(open(f"{mv_path}/_mv.json").read())
    assert "needs_refresh" not in doc2  # cleared by the self-refresh
    spark.catalog.dropTempView("mvpm")


def test_mv_restamp_guard_rejects_racing_append(spark, sf_dir, tmp_path):
    """r15 review: the re-stamp fires only when the post-commit LIVE
    listing equals the file set the rewrite itself installed — a
    racing external append (here injected between commit and hook by
    calling the hook with the pre-append committed set) must mark the
    MV for refresh instead of absorbing the foreign file into a fresh
    stamp."""
    src = str(tmp_path / "mvrg")
    load(spark, sf_dir, "orders").repartition(3).write.mode(
        "overwrite"
    ).parquet(src)
    eng = Engine(spark=spark)
    eng.register("mvrg", src)
    mv_path = str(tmp_path / "mvrg_mv")
    eng.create_materialized_view(
        "mvrg_mv",
        "SELECT o_orderstatus, COUNT(*) AS n FROM mvrg GROUP BY 1",
        mv_path,
    )
    mv = eng._mvs["mvrg_mv"]
    pre = eng._mv_pre_commit(src)
    assert pre == {"mvrg_mv": True}
    from quack_reduce_spark.operators.zonemaps import _data_files

    committed = sorted(_data_files(src))
    # the "racing append": a foreign file lands before the hook runs
    load(spark, sf_dir, "orders").limit(50).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    eng._mv_after_commit(src, "compact", pre, committed)
    assert mv.get("needs_refresh") is True, "foreign file must block the stamp"
    # and with a MATCHING listing the stamp fires cleanly
    committed2 = sorted(_data_files(src))
    mv.pop("needs_refresh", None)
    pre2 = eng._mv_pre_commit(src)  # stale now (append drifted it)
    eng._mv_after_commit(src, "compact", pre2, committed2)
    # drifted pre-state -> marked, not stamped (stamp requires fresh)
    assert mv.get("needs_refresh") is True
    # query: the lazy self-refresh restores exact answers
    eng.register("mvrg", src)
    d = eng.df("SELECT o_orderstatus, COUNT(*) AS n FROM mvrg GROUP BY 1")
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src).groupBy("o_orderstatus").count().collect(),
        )
    )
    assert got == want
    spark.catalog.dropTempView("mvrg")
