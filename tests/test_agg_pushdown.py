"""Metadata AGGREGATE pushdown through the SQL surface (round 13):
``SELECT COUNT(*)/MIN/MAX ... WHERE <range>`` over a zone-mapped table
answers from per-file manifest stats plus an O(1) boundary residual —
the reference dashboard's per-widget count (``dashboard.py:37-39``)
without reading contained files, and ZERO files when every surviving
file is contained. Soundness is stricter than pruning's (the whole
plan must be exactly understood), so half these tests are DECLINE
tests: anything outside the understood surface must run the plain plan
and stay correct."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from quack_reduce_spark.engine import Engine
from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.operators import zonemaps as Z


def _no_file_scan(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "FileScan" not in plan and "Scan parquet" not in plan


def _clustered(spark, sf_dir, tmp_path, name):
    path = str(tmp_path / name)
    orders = load(spark, sf_dir, "orders")
    (
        orders.repartitionByRange(12, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    Z.write_zonemap(spark, path, ["o_orderdate", "o_totalprice"])
    return path


def test_sql_count_range_metadata_plus_boundary(spark, sf_dir, tmp_path):
    """The headline shape: a wide half-open range count reads only the
    boundary files; a whole-table count (and a range containing every
    file) builds a plan with NO file scan at all — the answer is pure
    metadata."""
    path = _clustered(spark, sf_dir, tmp_path, "aggsql")
    eng = Engine(spark=spark)
    eng.register("aggsql", path)
    full = spark.read.parquet(path)
    q = (
        "SELECT COUNT(*) AS n FROM aggsql "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1999-07-01'"
    )
    got = eng.sql(q)
    plan = eng.last_agg_plan
    assert plan is not None and plan["table"] == "aggsql"
    assert plan["files_scanned"] <= 3 and plan["files_contained"] >= 5
    lo = F.lit(dt.datetime(1996, 1, 1)).cast("timestamp_ntz")
    hi = F.lit(dt.datetime(1999, 7, 1)).cast("timestamp_ntz")
    want = full.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).count()
    assert got.records[0]["n"] == want
    assert got.metadata["zonemap"]["aggsql"]["agg_pushdown"] == plan
    # zero-file case: no predicate -> the one-row frame scans nothing
    d = eng.df("SELECT COUNT(*) AS n FROM aggsql")
    assert eng.last_agg_plan["files_scanned"] == 0
    assert _no_file_scan(d)
    assert d.first()["n"] == full.count()
    spark.catalog.dropTempView("aggsql")


def test_sql_min_max_count_col_combo(spark, sf_dir, tmp_path):
    """COUNT(*), MIN, MAX and COUNT(col) compose in one SELECT: each
    combines its metadata partial with the boundary aggregate and all
    four equal plain execution. MIN/MAX over the NTZ timestamp column
    with no predicate is answered with no file scan."""
    path = _clustered(spark, sf_dir, tmp_path, "aggmm")
    eng = Engine(spark=spark)
    eng.register("aggmm", path)
    full = spark.read.parquet(path)
    q = (
        "SELECT COUNT(*) AS n, MIN(o_totalprice) AS mn, "
        "MAX(o_totalprice) AS mx, COUNT(o_totalprice) AS nc "
        "FROM aggmm WHERE o_orderdate >= TIMESTAMP '1996-01-01'"
    )
    r = eng.df(q).first()
    assert eng.last_agg_plan is not None
    sub = full.filter(
        F.col("o_orderdate")
        >= F.lit(dt.datetime(1996, 1, 1)).cast("timestamp_ntz")
    )
    w = sub.agg(
        F.count(F.lit(1)),
        F.min("o_totalprice"),
        F.max("o_totalprice"),
        F.count("o_totalprice"),
    ).first()
    assert (r["n"], r["mn"], r["mx"], r["nc"]) == (w[0], w[1], w[2], w[3])
    d = eng.df("SELECT MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx FROM aggmm")
    assert _no_file_scan(d)
    w2 = full.agg(F.min("o_orderdate"), F.max("o_orderdate")).first()
    got = d.first()
    assert (got["mn"], got["mx"]) == (w2[0], w2[1])
    spark.catalog.dropTempView("aggmm")


def test_sql_agg_strict_bound_not_counted_as_contained(spark, tmp_path):
    """Strictness is the exactness gap between pruning and answering:
    with single-valued files {1}, {2}, {3}, ``v < 2`` must count 1 —
    the {2} file survives closed-widened PRUNING but the strict
    classification may not count it from metadata."""
    path = str(tmp_path / "strict")
    for v in (1, 2, 3):
        spark.createDataFrame([(v,)] * 4, "v long").coalesce(1).write.mode(
            "append"
        ).parquet(path)
    Z.write_zonemap(spark, path, ["v"])
    eng = Engine(spark=spark)
    eng.register("strict_t", path)
    assert eng.df("SELECT COUNT(*) AS n FROM strict_t WHERE v < 2").first()["n"] == 4
    assert eng.last_agg_plan is not None
    assert eng.df("SELECT COUNT(*) AS n FROM strict_t WHERE v <= 2").first()["n"] == 8
    assert eng.df("SELECT COUNT(*) AS n FROM strict_t WHERE v > 2").first()["n"] == 4
    assert eng.df("SELECT MAX(v) AS m FROM strict_t WHERE v < 3").first()["m"] == 2
    spark.catalog.dropTempView("strict_t")


def test_sql_agg_unstatted_predicate_still_exact(spark, sf_dir, tmp_path):
    """A conjunct on a column the manifest does NOT stat makes every
    file a boundary file (nothing provable) — the answer must still be
    exact, and the un-statted column must not poison pruning into
    dropping files (the _file_matches none-vs-unstatted distinction)."""
    path = _clustered(spark, sf_dir, tmp_path, "aggun")
    eng = Engine(spark=spark)
    eng.register("aggun", path)
    full = spark.read.parquet(path)
    got = eng.df(
        "SELECT COUNT(*) AS n FROM aggun WHERE o_orderstatus = 'F'"
    ).first()["n"]
    assert got == full.filter("o_orderstatus = 'F'").count() > 0
    plan = eng.last_agg_plan
    assert plan is not None and plan["files_contained"] == 0
    # composed with a statted range, pruning still fires on the range
    got2 = eng.df(
        "SELECT COUNT(*) AS n FROM aggun WHERE o_orderstatus = 'F' "
        "AND o_orderdate < TIMESTAMP '1996-01-01'"
    ).first()["n"]
    assert got2 == full.filter(
        (F.col("o_orderstatus") == "F")
        & (
            F.col("o_orderdate")
            < F.lit(dt.datetime(1996, 1, 1)).cast("timestamp_ntz")
        )
    ).count()
    assert eng.last_agg_plan["files_pruned_in"] < 12
    spark.catalog.dropTempView("aggun")


def test_sql_agg_declines_outside_understood_surface(spark, sf_dir, tmp_path):
    """GROUP BY, DISTINCT aggregates, expression arguments, OR
    predicates, LIKE, and unsupported functions all decline — the
    query runs the plain (zonemap-pruned) plan and stays correct."""
    path = _clustered(spark, sf_dir, tmp_path, "aggdec")
    eng = Engine(spark=spark)
    eng.register("aggdec", path)
    full = spark.read.parquet(path)
    cases = [
        ("SELECT o_orderstatus AS s, COUNT(*) AS n FROM aggdec GROUP BY o_orderstatus", None),
        ("SELECT COUNT(DISTINCT o_orderstatus) AS n FROM aggdec", None),
        ("SELECT MIN(o_totalprice + 1.0) AS m FROM aggdec", None),
        ("SELECT SUM(o_totalprice) AS s FROM aggdec", None),
        ("SELECT COUNT(*) AS n FROM aggdec WHERE o_orderstatus = 'F' OR o_totalprice < 1000", None),
        ("SELECT COUNT(*) AS n FROM aggdec WHERE o_orderpriority LIKE '1%'", None),
    ]
    for q, _ in cases:
        d = eng.df(q)
        assert eng.last_agg_plan is None, q
        # row-identity against plain spark.sql on the raw data
        full.createOrReplaceTempView("aggdec_raw")
        want = spark.sql(q.replace("aggdec", "aggdec_raw")).collect()
        assert sorted(map(tuple, d.collect())) == sorted(map(tuple, want)), q
    spark.catalog.dropTempView("aggdec")
    spark.catalog.dropTempView("aggdec_raw")


def test_sql_agg_all_null_and_is_null(spark, tmp_path):
    """NULL semantics end to end: an all-NULL file contributes nothing
    to comparison counts (its rows fail every comparison), COUNT(col)
    subtracts per-file null counts, IS NULL / IS NOT NULL answer from
    the null stats — all without scanning when stats decide."""
    path = str(tmp_path / "aggnull")
    spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double").coalesce(
        1
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, None), (4, None)], "k long, v double"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame([(5, 50.0), (6, None)], "k long, v double").coalesce(
        1
    ).write.mode("append").parquet(path)
    Z.write_zonemap(spark, path, ["k", "v"])
    eng = Engine(spark=spark)
    eng.register("aggnull", path)
    d = eng.df(
        "SELECT COUNT(*) AS n, COUNT(v) AS nv, MIN(v) AS mn FROM aggnull"
    )
    assert _no_file_scan(d)
    assert tuple(d.first()) == (6, 3, 10.0)
    assert eng.df("SELECT COUNT(*) AS n FROM aggnull WHERE v >= 0").first()["n"] == 3
    assert eng.df("SELECT COUNT(*) AS n FROM aggnull WHERE v IS NULL").first()["n"] == 3
    d2 = eng.df("SELECT COUNT(*) AS n FROM aggnull WHERE v IS NOT NULL")
    assert d2.first()["n"] == 3
    spark.catalog.dropTempView("aggnull")


def test_sql_sum_pushdown_exact(spark, sf_dir, tmp_path):
    """SUM composes from metadata only where per-file sums are exact in
    any order: a long SUM over a range equals plain execution with only
    boundary files scanned, the whole-table long+decimal SUMs compile
    to a no-file-scan plan, and a DOUBLE SUM (order-dependent) declines
    to the plain plan while staying correct."""
    import decimal as _pydec

    path = str(tmp_path / "sumpush")
    orders = load(spark, sf_dir, "orders").withColumn(
        "price", F.col("o_totalprice").cast("decimal(12,2)")
    )
    (
        orders.repartitionByRange(12, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    Z.write_zonemap(spark, path, ["o_orderdate", "o_orderkey", "price"])
    eng = Engine(spark=spark)
    eng.register("sum_t", path)
    full = spark.read.parquet(path)
    q = (
        "SELECT SUM(o_orderkey) AS s, COUNT(*) AS n FROM sum_t "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01'"
    )
    r = eng.df(q).first()
    plan = eng.last_agg_plan
    assert plan is not None and plan["files_contained"] >= 3
    sub = full.filter(
        F.col("o_orderdate")
        >= F.lit(dt.datetime(1996, 1, 1)).cast("timestamp_ntz")
    )
    w = sub.agg(F.sum("o_orderkey"), F.count(F.lit(1))).first()
    assert (r["s"], r["n"]) == (w[0], w[1])
    d2 = eng.df("SELECT SUM(o_orderkey) AS s, SUM(price) AS sp FROM sum_t")
    assert _no_file_scan(d2)
    w2 = full.agg(F.sum("o_orderkey"), F.sum("price")).first()
    g2 = d2.first()
    assert (g2["s"], g2["sp"]) == (w2[0], w2[1])
    assert isinstance(g2["sp"], _pydec.Decimal)
    # double SUM: order-dependent, must DECLINE (plain plan, no agg tele)
    d3 = eng.df("SELECT SUM(o_totalprice) AS s FROM sum_t")
    assert eng.last_agg_plan is None
    assert abs(d3.first()["s"] - full.agg(F.sum("o_totalprice")).first()[0]) < 1e-6
    spark.catalog.dropTempView("sum_t")


def test_sql_sum_pushdown_null_semantics(spark, tmp_path):
    """SUM ignores NULLs per file (the manifest's try_sum does too), an
    all-NULL file contributes nothing, and SUM over an entirely NULL
    column is NULL — all from metadata with no file scan."""
    path = str(tmp_path / "sumnull")
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, None), (4, None)], "k long, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(5, 50), (6, None)], "k long, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    Z.write_zonemap(spark, path, ["k", "v"])
    eng = Engine(spark=spark)
    eng.register("sumnull", path)
    d = eng.df("SELECT SUM(v) AS s, SUM(k) AS sk FROM sumnull")
    assert _no_file_scan(d)
    assert tuple(d.first()) == (80, 21)
    d2 = eng.df("SELECT SUM(v) AS s FROM sumnull WHERE v IS NULL")
    assert d2.first()["s"] is None
    spark.catalog.dropTempView("sumnull")


def test_sql_group_agg_from_metadata(spark, sf_dir, tmp_path):
    """GROUP BY pushdown: on a hive-partitioned layout every file is
    single-valued on the grouping column, so the per-group
    COUNT/SUM/MIN partials come straight from the manifest and the
    plan has NO file scan; with a range conjunct the contained files'
    per-group partials merge with a grouped residual over only the
    boundary files — both row-identical to plain execution."""
    path = str(tmp_path / "grpagg")
    orders = load(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    Z.write_zonemap(
        spark, path, ["o_orderstatus", "o_orderkey", "o_orderdate"]
    )
    eng = Engine(spark=spark)
    eng.register("grp_t", path)
    full = spark.read.parquet(path)
    d = eng.df(
        "SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS s, "
        "MIN(o_orderkey) AS mn FROM grp_t GROUP BY o_orderstatus"
    )
    plan = eng.last_agg_plan
    assert plan is not None and plan["group_by"] == ["o_orderstatus"]
    assert plan["files_scanned"] == 0 and plan["groups_metadata"] >= 3
    assert _no_file_scan(d)
    want = sorted(
        map(
            tuple,
            full.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").alias("s"),
                F.min("o_orderkey").alias("mn"),
            )
            .collect(),
        )
    )
    assert sorted(map(tuple, d.collect())) == want
    # range conjunct: contained partials + grouped boundary residual
    d2 = eng.df(
        "SELECT o_orderstatus AS st, COUNT(*) AS n FROM grp_t "
        "WHERE o_orderdate >= TIMESTAMP '1996-06-01' GROUP BY o_orderstatus"
    )
    assert eng.last_agg_plan is not None
    w2 = sorted(
        map(
            tuple,
            full.filter(
                F.col("o_orderdate")
                >= F.lit(dt.datetime(1996, 6, 1)).cast("timestamp_ntz")
            )
            .groupBy("o_orderstatus")
            .count()
            .collect(),
        )
    )
    assert sorted(map(tuple, d2.collect())) == w2
    spark.catalog.dropTempView("grp_t")


def test_sql_group_agg_boundary_and_null_groups(spark, tmp_path):
    """Soundness corners of group mode: a multi-valued file goes to the
    boundary and merges exactly; an all-NULL-key file feeds the SQL
    NULL group from metadata; partial-NULL-key files are boundary."""
    path = str(tmp_path / "grpnull")
    # file A: single-valued key 'a' (metadata-attributable)
    spark.createDataFrame(
        [("a", 1), ("a", 2)], "k string, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    # file B: all-NULL key (the NULL group, metadata-attributable)
    spark.createDataFrame(
        [(None, 10), (None, 20)], "k string, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    # file C: multi-valued + a NULL (boundary)
    spark.createDataFrame(
        [("a", 100), ("b", 200), (None, 300)], "k string, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    Z.write_zonemap(spark, path, ["k", "v"])
    eng = Engine(spark=spark)
    eng.register("grpn_t", path)
    d = eng.df(
        "SELECT k, COUNT(*) AS n, SUM(v) AS s FROM grpn_t GROUP BY k"
    )
    plan = eng.last_agg_plan
    assert plan is not None and plan["files_contained"] == 2
    assert plan["files_scanned"] == 1 and plan["groups_metadata"] == 2
    got = sorted(map(tuple, d.collect()), key=lambda t: (t[0] is None, t))
    assert got == [
        ("a", 3, 103),
        ("b", 1, 200),
        (None, 3, 330),
    ]
    spark.catalog.dropTempView("grpn_t")


def test_sql_group_agg_declines_unportable_shapes(spark, sf_dir, tmp_path):
    """Group mode declines what it can't re-render exactly — a
    timestamp grouping key, multiple grouping columns, a MIN over a
    timestamp — and the plain plan stays correct."""
    path = str(tmp_path / "grpdec")
    orders = load(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    Z.write_zonemap(
        spark, path, ["o_orderstatus", "o_orderkey", "o_orderdate"]
    )
    eng = Engine(spark=spark)
    eng.register("grpd_t", path)
    full = spark.read.parquet(path)
    cases = [
        # ts grouping key: row-rendering declined
        "SELECT o_orderdate AS d, COUNT(*) AS n FROM grpd_t GROUP BY o_orderdate",
        # beyond _MAX_GROUP_KEYS grouping columns (multi-key grouping
        # itself is supported up to 4 keys — see the multi-key test)
        "SELECT COUNT(*) AS n FROM grpd_t GROUP BY o_orderstatus, "
        "o_orderkey, o_custkey, o_orderpriority, o_totalprice",
        # MIN over a timestamp in group mode
        "SELECT o_orderstatus AS st, MIN(o_orderdate) AS mn FROM grpd_t "
        "GROUP BY o_orderstatus",
        # DISTINCT over a column with no stats (not a zonemap col)
        "SELECT DISTINCT o_orderpriority AS pr FROM grpd_t",
    ]
    full.createOrReplaceTempView("grpd_raw")
    for q in cases:
        d = eng.df(q)
        assert eng.last_agg_plan is None, q
        want = spark.sql(q.replace("grpd_t", "grpd_raw")).collect()
        assert sorted(map(tuple, d.collect())) == sorted(map(tuple, want)), q
    spark.catalog.dropTempView("grpd_t")
    spark.catalog.dropTempView("grpd_raw")


def test_sql_agg_eq_composes_with_bloom(spark, sf_dir, tmp_path):
    """A point COUNT on a bloom-fingerprinted key over a layout the key
    is not clustered by: the fingerprint (not the useless min/max
    envelope) keeps only the files that can hold the key, and the
    count equals plain execution."""
    path = str(tmp_path / "aggblm")
    orders = load(spark, sf_dir, "orders")
    orders.repartition(12, "o_custkey").write.mode("overwrite").parquet(path)
    Z.write_zonemap(spark, path, ["o_orderkey"], bloom_cols=["o_orderkey"])
    full = spark.read.parquet(path)
    key = full.select("o_orderkey").orderBy("o_orderkey").offset(
        full.count() // 2
    ).limit(1).first()[0]
    eng = Engine(spark=spark)
    eng.register("aggblm", path)
    got = eng.df(
        f"SELECT COUNT(*) AS n FROM aggblm WHERE o_orderkey = {key}"
    ).first()["n"]
    assert got == full.filter(F.col("o_orderkey") == key).count() > 0
    plan = eng.last_agg_plan
    assert plan is not None and plan["files_pruned_in"] <= 3
    spark.catalog.dropTempView("aggblm")


def test_sql_agg_session_zoned_timestamp_off_utc(spark, sf_dir, tmp_path):
    """Session-zoned timestamp bounds flow in epoch space end to end:
    with an off-UTC session zone, the metadata-answered count equals
    plain Spark execution of the same SQL (which interprets the
    literal in the session zone)."""
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        path = str(tmp_path / "aggtz")
        orders = load(spark, sf_dir, "orders").withColumn(
            "o_ts", F.col("o_orderdate").cast("timestamp")
        )
        (
            orders.repartitionByRange(6, "o_ts")
            .sortWithinPartitions("o_ts")
            .write.mode("overwrite")
            .parquet(path)
        )
        Z.write_zonemap(spark, path, ["o_ts"])
        eng = Engine(spark=spark)
        eng.register("aggtz", path)
        q = (
            "SELECT COUNT(*) AS n, MIN(o_ts) AS mn FROM aggtz "
            "WHERE o_ts >= TIMESTAMP '1996-01-01 00:00:00' "
            "AND o_ts < TIMESTAMP '1997-06-30 00:00:00'"
        )
        got = eng.df(q).first()
        assert eng.last_agg_plan is not None
        spark.read.parquet(path).createOrReplaceTempView("aggtz_raw")
        want = spark.sql(q.replace("aggtz", "aggtz_raw")).first()
        assert (got["n"], got["mn"]) == (want["n"], want["mn"])
        assert got["n"] > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
        spark.catalog.dropTempView("aggtz")
        spark.catalog.dropTempView("aggtz_raw")


def test_count_where_unstatted_column_not_zero(spark, sf_dir, tmp_path):
    """Regression for the _file_matches fix: a count_where constraint
    on a column with NO manifest stats must fall through to boundary
    scans (exact answer), not prune every file into a silent 0."""
    path = _clustered(spark, sf_dir, tmp_path, "cwun")
    eng = Engine(spark=spark)
    eng.register("cwun", path)
    got = eng.count_where("cwun", {"o_orderkey": (None, 1000)})
    want = (
        spark.read.parquet(path).filter(F.col("o_orderkey") <= 1000).count()
    )
    assert got == want > 0
    assert eng.last_count_plan["source"] == "metadata+residual"
    assert eng.last_count_plan["files_contained"] == 0
    spark.catalog.dropTempView("cwun")

def test_sql_avg_pushdown_exact_and_declines(spark, sf_dir, tmp_path):
    """AVG rebuilds as exact-integer SUM / exact COUNT with one final
    double division: a range AVG over a clustered long column equals
    plain execution with only boundary files scanned, the whole-table
    AVG compiles to a no-file-scan plan, and order-dependent shapes
    (double AVG, decimal AVG) decline to the plain plan."""
    path = _clustered(spark, sf_dir, tmp_path, "avgpush")
    Z.write_zonemap(spark, path, ["o_orderdate", "o_orderkey"])
    eng = Engine(spark=spark)
    eng.register("avg_t", path)
    full = spark.read.parquet(path)
    r = eng.df(
        "SELECT AVG(o_orderkey) AS a, COUNT(*) AS n FROM avg_t "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01'"
    ).first()
    plan = eng.last_agg_plan
    assert plan is not None and plan["files_contained"] >= 3
    sub = full.filter(
        F.col("o_orderdate")
        >= F.lit(dt.datetime(1996, 1, 1)).cast("timestamp_ntz")
    )
    w = sub.agg(F.avg("o_orderkey"), F.count(F.lit(1))).first()
    assert r["n"] == w[1] and r["a"] == w[0]  # division is bit-exact here
    d2 = eng.df("SELECT AVG(o_orderkey) AS a FROM avg_t")
    assert _no_file_scan(d2)
    assert d2.first()["a"] == full.agg(F.avg("o_orderkey")).first()[0]
    # double AVG is accumulation-order-dependent: decline, stay correct
    d3 = eng.df("SELECT AVG(o_totalprice) AS a FROM avg_t")
    assert eng.last_agg_plan is None
    assert abs(d3.first()["a"] - full.agg(F.avg("o_totalprice")).first()[0]) < 1e-9
    spark.catalog.dropTempView("avg_t")


def test_sql_avg_null_semantics_and_groups(spark, tmp_path):
    """AVG of zero non-null rows is NULL — scalar and per group — and
    an all-NULL file contributes nothing to a group's partials, all
    from metadata with no file scan."""
    path = str(tmp_path / "avgnull")
    spark.createDataFrame(
        [(1, 10), (1, 20)], "k int, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(2, None), (2, None)], "k int, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    Z.write_zonemap(spark, path, ["k", "v"])
    eng = Engine(spark=spark)
    eng.register("avgnull", path)
    d = eng.df("SELECT k, AVG(v) AS a FROM avgnull GROUP BY k")
    assert eng.last_agg_plan is not None
    assert eng.last_agg_plan["files_scanned"] == 0
    assert _no_file_scan(d)
    got = {r["k"]: r["a"] for r in d.collect()}
    assert got == {1: 15.0, 2: None}
    r2 = eng.df("SELECT AVG(v) AS a FROM avgnull WHERE v IS NULL").first()
    assert r2["a"] is None
    spark.catalog.dropTempView("avgnull")

def test_sql_multi_key_group_agg_from_metadata(spark, sf_dir, tmp_path):
    """Multi-key GROUP BY pushdown: on a two-level hive layout every
    file is single-valued on BOTH grouping columns, so per-(a,b)
    partials come straight from the manifest (zero files scanned) —
    including the layout's URI-escapable partition value ('4-NOT
    SPECIFIED' carries a space). A key grouped on but projected out
    still groups over all keys."""
    path = str(tmp_path / "mkgrp")
    orders = load(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus", "o_orderpriority").mode(
        "overwrite"
    ).parquet(path)
    Z.write_zonemap(
        spark, path, ["o_orderstatus", "o_orderpriority", "o_orderkey"]
    )
    eng = Engine(spark=spark)
    eng.register("mk_t", path)
    full = spark.read.parquet(path)
    d = eng.df(
        "SELECT o_orderstatus AS st, o_orderpriority AS pr, COUNT(*) AS n, "
        "SUM(o_orderkey) AS s, AVG(o_orderkey) AS a FROM mk_t "
        "GROUP BY o_orderstatus, o_orderpriority"
    )
    plan = eng.last_agg_plan
    assert plan is not None
    assert plan["group_by"] == ["o_orderstatus", "o_orderpriority"]
    assert plan["files_scanned"] == 0
    assert _no_file_scan(d)
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            full.groupBy(
                F.col("o_orderstatus").alias("st"),
                F.col("o_orderpriority").alias("pr"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").alias("s"),
                F.avg("o_orderkey").alias("a"),
            )
            .collect(),
        )
    )
    assert got == want
    # a grouping key may be projected out: rows stay per-(a,b) group
    d2 = eng.df(
        "SELECT o_orderstatus AS st, COUNT(*) AS n FROM mk_t "
        "GROUP BY o_orderstatus, o_orderpriority"
    )
    assert eng.last_agg_plan is not None
    g2 = sorted(map(tuple, d2.collect()))
    w2 = sorted(
        map(
            tuple,
            full.groupBy("o_orderstatus", "o_orderpriority")
            .count()
            .select(F.col("o_orderstatus").alias("st"), "count")
            .collect(),
        )
    )
    assert g2 == w2
    spark.catalog.dropTempView("mk_t")


def test_manifest_uri_escaped_partition_values(spark, sf_dir, tmp_path):
    """Path URIs percent-encode special chars (a partition value with
    a space renders %20) while listings return literal names: the
    manifest must store ONE form, or space-bearing layouts get
    duplicate rows (build) and double-stats (append). Counts must
    match the listing after both, appends must be idempotent, and
    pruned-in files must be readable."""
    path = str(tmp_path / "escparts")
    orders = load(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_orderkey"]
    orders.write.partitionBy("o_orderstatus", "o_orderpriority").mode(
        "overwrite"
    ).parquet(path)
    Z.write_zonemap(spark, path, cols)
    rows, total = Z.prune_files_multi(spark, path, {})
    assert total == len(Z._data_files(path))
    orders.filter(F.col("o_orderkey") <= 100).write.partitionBy(
        "o_orderstatus", "o_orderpriority"
    ).mode("append").parquet(path)
    assert Z.append_zonemap(spark, path, cols) > 0
    _rows, total2 = Z.prune_files_multi(spark, path, {})
    assert total2 == len(Z._data_files(path))
    assert Z.append_zonemap(spark, path, cols) == 0  # idempotent
    sel, t3 = Z.prune_files_multi(
        spark,
        path,
        {"o_orderpriority": (None, None, frozenset(["4-NOT SPECIFIED"]), None)},
    )
    assert 0 < len(sel) < t3
    got = (
        spark.read.option("basePath", path)
        .parquet(*[r["file"] for r in sel])
        .filter(F.col("o_orderpriority") == "4-NOT SPECIFIED")
        .count()
    )
    want = (
        spark.read.parquet(path)
        .filter(F.col("o_orderpriority") == "4-NOT SPECIFIED")
        .count()
    )
    assert got == want

def test_sql_agg_order_by_limit_peeling(spark, sf_dir, tmp_path):
    """The dashboard top-k shape (GROUP BY k ORDER BY n DESC LIMIT 2)
    peels its Sort/Limit, answers from metadata, and re-applies the
    order on the rebuilt frame; an ORDER BY expression (not a bare
    output) declines and stays correct."""
    path = str(tmp_path / "topkagg")
    orders = load(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    Z.write_zonemap(spark, path, ["o_orderstatus", "o_orderkey"])
    eng = Engine(spark=spark)
    eng.register("topk_t", path)
    full = spark.read.parquet(path)
    d = eng.df(
        "SELECT o_orderstatus AS st, COUNT(*) AS n FROM topk_t "
        "GROUP BY o_orderstatus ORDER BY n DESC, st ASC LIMIT 2"
    )
    plan = eng.last_agg_plan
    assert plan is not None and plan["files_scanned"] == 0
    got = [tuple(r) for r in d.collect()]
    want = [
        tuple(r)
        for r in full.groupBy(F.col("o_orderstatus").alias("st"))
        .count()
        .orderBy(F.col("count").desc(), F.col("st").asc())
        .limit(2)
        .collect()
    ]
    assert got == want
    # scalar shape with ORDER BY on the aggregate output also peels
    r = eng.df(
        "SELECT MAX(o_orderkey) AS mx FROM topk_t ORDER BY mx"
    ).first()
    assert eng.last_agg_plan is not None
    assert r["mx"] == full.agg(F.max("o_orderkey")).first()[0]
    # ORDER BY an expression over an output: decline, stay correct
    d3 = eng.df(
        "SELECT o_orderstatus AS st, COUNT(*) AS n FROM topk_t "
        "GROUP BY o_orderstatus ORDER BY n % 7, st LIMIT 2"
    )
    assert eng.last_agg_plan is None
    w3 = (
        full.groupBy(F.col("o_orderstatus").alias("st"))
        .count()
        .orderBy((F.col("count") % 7), F.col("st"))
        .limit(2)
        .collect()
    )
    assert [tuple(r) for r in d3.collect()] == [tuple(r) for r in w3]
    spark.catalog.dropTempView("topk_t")

def test_sql_agg_having_peeling(spark, sf_dir, tmp_path):
    """HAVING peels as a Filter above the Aggregate — including the
    projected-away auxiliary-aggregate shape (HAVING COUNT(*) over a
    SELECT that doesn't output it): the hidden aggregate computes as
    an extra metadata partial, the filter applies before the visible
    projection, and ORDER BY/LIMIT compose on top."""
    path = str(tmp_path / "havagg")
    orders = load(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    Z.write_zonemap(spark, path, ["o_orderstatus", "o_orderkey"])
    eng = Engine(spark=spark)
    eng.register("hav_t", path)
    full = spark.read.parquet(path)
    want = sorted(
        map(
            tuple,
            full.groupBy(F.col("o_orderstatus").alias("st"))
            .count()
            .filter(F.col("count") > 100)
            .collect(),
        )
    )
    d = eng.df(
        "SELECT o_orderstatus AS st, COUNT(*) AS n FROM hav_t "
        "GROUP BY o_orderstatus HAVING COUNT(*) > 100"
    )
    assert eng.last_agg_plan is not None
    assert eng.last_agg_plan["files_scanned"] == 0
    assert sorted(map(tuple, d.collect())) == want
    # alias form
    d2 = eng.df(
        "SELECT o_orderstatus AS st, COUNT(*) AS n FROM hav_t "
        "GROUP BY o_orderstatus HAVING n > 100"
    )
    assert eng.last_agg_plan is not None
    assert sorted(map(tuple, d2.collect())) == want
    # hidden auxiliary aggregate + ORDER BY + LIMIT
    d3 = eng.df(
        "SELECT o_orderstatus AS st, SUM(o_orderkey) AS s FROM hav_t "
        "GROUP BY o_orderstatus HAVING COUNT(*) > 100 ORDER BY st LIMIT 3"
    )
    assert eng.last_agg_plan is not None
    w3 = [
        tuple(r)
        for r in full.groupBy(F.col("o_orderstatus").alias("st"))
        .agg(F.sum("o_orderkey").alias("s"), F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 100)
        .select("st", "s")
        .orderBy("st")
        .limit(3)
        .collect()
    ]
    assert [tuple(r) for r in d3.collect()] == w3
    # HAVING over an expression of aggregates: decline, stay correct
    d4 = eng.df(
        "SELECT o_orderstatus AS st, COUNT(*) AS n FROM hav_t "
        "GROUP BY o_orderstatus HAVING COUNT(*) % 2 = 1"
    )
    assert eng.last_agg_plan is None
    w4 = sorted(
        map(
            tuple,
            full.groupBy(F.col("o_orderstatus").alias("st"))
            .count()
            .filter(F.col("count") % 2 == 1)
            .collect(),
        )
    )
    assert sorted(map(tuple, d4.collect())) == w4
    spark.catalog.dropTempView("hav_t")

def test_sql_distinct_from_metadata(spark, sf_dir, tmp_path):
    """SELECT DISTINCT over pinned grouping columns — the SHOW
    PARTITIONS query — answers from the manifest with no file scan; a
    WHERE on a statted column scans only the boundary files; the
    GROUP-BY-no-aggregate form is the same shape."""
    path = str(tmp_path / "distmeta")
    orders = load(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus", "o_orderpriority").mode(
        "overwrite"
    ).parquet(path)
    Z.write_zonemap(
        spark, path, ["o_orderstatus", "o_orderpriority", "o_orderkey"]
    )
    eng = Engine(spark=spark)
    eng.register("dist_t", path)
    full = spark.read.parquet(path)
    d = eng.df("SELECT DISTINCT o_orderstatus, o_orderpriority FROM dist_t")
    plan = eng.last_agg_plan
    assert plan is not None and plan["files_scanned"] == 0
    assert _no_file_scan(d)
    got = sorted(map(tuple, d.collect()))
    want = sorted(
        map(
            tuple,
            full.select("o_orderstatus", "o_orderpriority").distinct().collect(),
        )
    )
    assert got == want
    d2 = eng.df(
        "SELECT DISTINCT o_orderpriority FROM dist_t "
        "WHERE o_orderkey <= 3000 ORDER BY o_orderpriority"
    )
    assert eng.last_agg_plan is not None
    g2 = [r[0] for r in d2.collect()]
    w2 = sorted(
        r[0]
        for r in full.filter(F.col("o_orderkey") <= 3000)
        .select("o_orderpriority")
        .distinct()
        .collect()
    )
    assert g2 == w2
    d3 = eng.df(
        "SELECT o_orderstatus AS st FROM dist_t GROUP BY o_orderstatus "
        "ORDER BY st"
    )
    assert eng.last_agg_plan is not None
    assert [r["st"] for r in d3.collect()] == ["F", "O", "P"]
    spark.catalog.dropTempView("dist_t")

def test_sql_count_distinct_pushdown(spark, sf_dir, tmp_path):
    """Scalar COUNT(DISTINCT col): pinned files contribute their
    single value to a distinct set (zero files read on a partitioned
    layout), un-pinned files demote to the boundary scan whose values
    union in Spark; two distinct columns (Catalyst's Expand rewrite)
    and grouped distinct decline and stay correct."""
    path = str(tmp_path / "cdist")
    orders = load(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    Z.write_zonemap(spark, path, ["o_orderstatus", "o_orderkey", "o_custkey"])
    eng = Engine(spark=spark)
    eng.register("cd_t", path)
    full = spark.read.parquet(path)
    d = eng.df(
        "SELECT COUNT(DISTINCT o_orderstatus) AS a, MAX(o_orderkey) AS mx, "
        "COUNT(*) AS n FROM cd_t"
    )
    assert eng.last_agg_plan is not None
    assert eng.last_agg_plan["files_scanned"] == 0
    assert _no_file_scan(d)
    w = full.agg(
        F.count_distinct("o_orderstatus"), F.max("o_orderkey"),
        F.count(F.lit(1)),
    ).first()
    assert tuple(d.first()) == tuple(w)
    # un-pinned distinct column: boundary union, exact
    d2 = eng.df(
        "SELECT COUNT(DISTINCT o_custkey) AS n, SUM(o_orderkey) AS s "
        "FROM cd_t WHERE o_orderstatus = 'F'"
    )
    assert eng.last_agg_plan is not None
    sub = full.filter(F.col("o_orderstatus") == "F")
    w2 = sub.agg(F.count_distinct("o_custkey"), F.sum("o_orderkey")).first()
    assert tuple(d2.first()) == tuple(w2)
    # two distinct columns -> Expand rewrite -> decline, correct
    d3 = eng.df(
        "SELECT COUNT(DISTINCT o_orderstatus) AS a, "
        "COUNT(DISTINCT o_custkey) AS b FROM cd_t"
    )
    assert eng.last_agg_plan is None
    w3 = full.agg(
        F.count_distinct("o_orderstatus"), F.count_distinct("o_custkey")
    ).first()
    assert tuple(d3.first()) == tuple(w3)
    # grouped distinct: supported (see test_sql_grouped_count_distinct)
    d4 = eng.df(
        "SELECT o_orderstatus AS st, COUNT(DISTINCT o_custkey) AS n "
        "FROM cd_t GROUP BY o_orderstatus"
    )
    assert eng.last_agg_plan is not None
    w4 = sorted(
        map(
            tuple,
            full.groupBy(F.col("o_orderstatus").alias("st"))
            .agg(F.count_distinct("o_custkey").alias("n"))
            .collect(),
        )
    )
    assert sorted(map(tuple, d4.collect())) == w4
    # all-NULL column: COUNT(DISTINCT) is 0 from metadata
    path2 = str(tmp_path / "cdnull")
    import pyspark.sql.types as T

    spark.createDataFrame(
        [(1, None), (2, None)],
        T.StructType([
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.LongType()),
        ]),
    ).coalesce(1).write.parquet(path2)
    Z.write_zonemap(spark, path2, ["k", "v"])
    eng.register("cdnull", path2)
    d5 = eng.df("SELECT COUNT(DISTINCT v) AS n FROM cdnull")
    assert eng.last_agg_plan is not None
    assert d5.first()["n"] == 0
    spark.catalog.dropTempView("cd_t")
    spark.catalog.dropTempView("cdnull")

def test_sql_derived_time_bucket_grouping(spark, sf_dir, tmp_path):
    """GROUP BY year(d) / trunc(d,'month') / to_date(ts) — the
    time-series dashboard shape: a date-clustered file whose source
    endpoints fall in ONE bucket (the functions are monotone) pins to
    that bucket from metadata; files spanning a boundary scan. The
    non-monotone month() must decline (equal endpoints do not pin:
    Jan 2020 vs Jan 2021 wraps)."""
    path = str(tmp_path / "bucketagg")
    orders = load(spark, sf_dir, "orders")
    (
        orders.repartitionByRange(12, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    Z.write_zonemap(spark, path, ["o_orderdate", "o_orderkey"])
    eng = Engine(spark=spark)
    eng.register("bkt_t", path)
    full = spark.read.parquet(path)
    d = eng.df(
        "SELECT year(o_orderdate) AS y, COUNT(*) AS n, "
        "SUM(o_orderkey) AS s FROM bkt_t GROUP BY 1 ORDER BY y"
    )
    plan = eng.last_agg_plan
    assert plan is not None and plan["group_by"] == ["year(o_orderdate)"]
    assert plan["files_scanned"] < plan["files_total"]  # some files pin
    got = [tuple(r) for r in d.collect()]
    want = [
        tuple(r)
        for r in full.groupBy(
            F.year(F.col("o_orderdate").cast("date")).alias("y")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
        .orderBy("y")
        .collect()
    ]
    assert got == want
    # monthly buckets: most files straddle months -> boundary, exact
    d2 = eng.df(
        "SELECT trunc(o_orderdate,'month') AS m, COUNT(*) AS n "
        "FROM bkt_t GROUP BY 1 ORDER BY m"
    )
    assert eng.last_agg_plan is not None
    g2 = [tuple(r) for r in d2.collect()]
    w2 = [
        tuple(r)
        for r in full.groupBy(
            F.trunc(F.col("o_orderdate").cast("date"), "month").alias("m")
        ).count().orderBy("m").collect()
    ]
    assert g2 == w2
    # DISTINCT year: partially pinned, exact
    d3 = eng.df("SELECT DISTINCT year(o_orderdate) AS y FROM bkt_t ORDER BY y")
    p3 = eng.last_agg_plan
    assert p3 is not None and p3["files_scanned"] < p3["files_total"]
    assert [r["y"] for r in d3.collect()] == sorted(
        r[0]
        for r in full.select(
            F.year(F.col("o_orderdate").cast("date"))
        ).distinct().collect()
    )
    # non-monotone month(): decline, stay correct
    d4 = eng.df(
        "SELECT month(o_orderdate) AS m, COUNT(*) AS n FROM bkt_t GROUP BY 1"
    )
    assert eng.last_agg_plan is None
    g4 = sorted(map(tuple, d4.collect()))
    w4 = sorted(
        map(
            tuple,
            full.groupBy(
                F.month(F.col("o_orderdate").cast("date")).alias("m")
            ).count().collect(),
        )
    )
    assert g4 == w4
    spark.catalog.dropTempView("bkt_t")

def test_sql_grouped_count_distinct(spark, sf_dir, tmp_path):
    """Grouped COUNT(DISTINCT c) — the unique-per-bucket (DAU) shape:
    pinned (group, value) pairs come from metadata, boundary files
    contribute their distinct pairs in Spark, and the per-group counts
    null-safe-join back (the SQL NULL group included)."""
    path = str(tmp_path / "gcd")
    orders = load(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    Z.write_zonemap(
        spark, path,
        ["o_orderstatus", "o_custkey", "o_orderkey", "o_orderdate"],
    )
    eng = Engine(spark=spark)
    eng.register("gcd_t", path)
    full = spark.read.parquet(path)
    d = eng.df(
        "SELECT o_orderstatus AS st, COUNT(DISTINCT o_custkey) AS u, "
        "COUNT(*) AS n FROM gcd_t GROUP BY o_orderstatus ORDER BY st"
    )
    assert eng.last_agg_plan is not None
    got = [tuple(r) for r in d.collect()]
    want = [
        tuple(r)
        for r in full.groupBy(F.col("o_orderstatus").alias("st"))
        .agg(
            F.count_distinct("o_custkey").alias("u"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("st")
        .collect()
    ]
    assert got == want
    # composed with a derived bucket: unique customers per year
    d2 = eng.df(
        "SELECT year(o_orderdate) AS y, COUNT(DISTINCT o_custkey) AS u "
        "FROM gcd_t GROUP BY 1 ORDER BY y"
    )
    assert eng.last_agg_plan is not None
    g2 = [tuple(r) for r in d2.collect()]
    w2 = [
        tuple(r)
        for r in full.groupBy(
            F.year(F.col("o_orderdate").cast("date")).alias("y")
        )
        .agg(F.count_distinct("o_custkey").alias("u"))
        .orderBy("y")
        .collect()
    ]
    assert g2 == w2
    # fully pinned distinct column: zero files scanned
    d3 = eng.df(
        "SELECT o_orderstatus AS st, COUNT(DISTINCT o_orderstatus) AS k "
        "FROM gcd_t GROUP BY o_orderstatus"
    )
    assert eng.last_agg_plan is not None
    assert eng.last_agg_plan["files_scanned"] == 0
    assert sorted((r["st"], r["k"]) for r in d3.collect()) == [
        ("F", 1), ("O", 1), ("P", 1),
    ]
    # NULL group + all-NULL values
    import pyspark.sql.types as T

    path2 = str(tmp_path / "gcdnull")
    spark.createDataFrame(
        [("a", 1), (None, 2), (None, 2), (None, None)],
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("v", T.IntegerType()),
        ]),
    ).coalesce(1).write.parquet(path2)
    Z.write_zonemap(spark, path2, ["k", "v"])
    eng.register("gcdnull", path2)
    r = {
        x["k"]: x["u"]
        for x in eng.df(
            "SELECT k, COUNT(DISTINCT v) AS u FROM gcdnull GROUP BY k"
        ).collect()
    }
    assert eng.last_agg_plan is not None
    assert r == {"a": 1, None: 1}
    spark.catalog.dropTempView("gcd_t")
    spark.catalog.dropTempView("gcdnull")
