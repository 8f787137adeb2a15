"""Engine API tests (reference lifecycle parity: app.py / quack.py)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from quack_reduce_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    eng = Engine(spark=spark)
    eng.register_dir(sf_dir, ["lineitem", "orders", "customer"])
    return eng


def test_sql_envelope(engine):
    res = engine.sql("SELECT COUNT(*) AS counts FROM lineitem")
    assert res.records == [{"counts": 6000}]
    assert set(res.metadata) == {
        "timeMs", "eventId", "query", "warm", "result_cache"
    }
    assert res.metadata["timeMs"] > 0


def test_warm_flag_flips(engine):
    first = engine.sql("SELECT 1 AS one")
    second = engine.sql("SELECT 1 AS one")
    assert second.metadata["warm"] is True
    assert first.metadata["warm"] in (True, False)


def test_default_row_cap(engine):
    # reference app.py:9,54 — server-side default cap of 20 rows
    res = engine.sql("SELECT l_orderkey FROM lineitem")
    assert len(res.records) == 20


def test_timestamp_serialization(engine):
    # reference app.py:61-67 — timestamps leave the engine as strings
    res = engine.sql("SELECT MAX(o_orderdate) AS latest FROM orders")
    assert isinstance(res.records[0]["latest"], str)


def test_bad_sql_does_not_kill_session(engine):
    with pytest.raises(Exception):
        engine.sql("SELEC nope")
    assert engine.sql("SELECT 1 AS one").records == [{"one": 1}]


def test_view_composition(engine):
    # reference dbt ref() chain (SURVEY §3 EP3)
    engine.create_view(
        "by_supp", "SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1"
    )
    res = engine.sql("SELECT COUNT(*) AS n_supp FROM by_supp")
    assert res.records[0]["n_supp"] == 10


def test_partitioned_write_and_pruning(engine, tmp_path):
    li = engine.spark.table("lineitem").withColumn("m", F.month("l_shipdate"))
    engine.write_partitioned(li, str(tmp_path / "p"), ["m"])
    assert any(d.startswith("m=") for d in os.listdir(tmp_path / "p"))
    back = engine.register("p_li", str(tmp_path / "p"))
    assert back.filter(F.col("m") == 3).count() > 0


def test_materialize_single_artifact(engine, tmp_path):
    df = engine.df("SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1")
    engine.materialize(df, str(tmp_path / "view.parquet"))
    files = [f for f in os.listdir(tmp_path / "view.parquet") if f.endswith(".parquet")]
    assert len(files) == 1


def test_format_dispatching_write_roundtrip(spark, sf_dir, tmp_path):
    from quack_reduce_spark.engine import Engine

    eng = Engine(spark=spark) if "spark" in Engine.__init__.__code__.co_varnames else Engine()
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    for fmt in ["parquet", "csv", "json", "orc"]:
        out = str(tmp_path / fmt)
        eng.write(df, out, fmt=fmt)
        from quack_reduce_spark.sources import read_table

        back = read_table(spark, out, fmt=fmt)
        assert {(r["k"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_missing_table_error_does_not_kill_session(spark):
    # analysis errors follow the same contract as parse errors: the
    # exception propagates to the caller (the CLI renders it), and the
    # session keeps serving queries
    from pyspark.sql.utils import AnalysisException

    from quack_reduce_spark.engine import Engine

    eng = Engine()
    with pytest.raises(AnalysisException):
        eng.sql("SELECT * FROM definitely_not_a_table")
    assert eng.sql("SELECT 1 AS one").records == [{"one": 1}]


def test_records_json_safe_nested(spark):
    # ADVICE r1: timestamps/dates/Decimals nested in arrays/structs
    # must be converted too, not only top-level values
    import json

    from quack_reduce_spark.engine import _records_json_safe

    df = spark.sql(
        "SELECT array(timestamp'2024-01-01 00:00:00') AS ts_arr, "
        "named_struct('d', date'2024-02-03', 'dec', cast(1.5 as decimal(5,2))) AS st, "
        "map('k', timestamp'2024-06-07 08:09:10') AS m"
    )
    recs = _records_json_safe(df)
    json.dumps(recs)  # would raise on any unconverted value
    assert recs[0]["ts_arr"] == ["2024-01-01 00:00:00"]
    assert recs[0]["st"]["d"] == "2024-02-03"
    assert recs[0]["st"]["dec"] == 1.5
    assert recs[0]["m"]["k"] == "2024-06-07 08:09:10"


def test_explain_surfaces_pushdown(engine):
    plan = engine.explain(
        "SELECT l_suppkey, COUNT(*) AS n FROM lineitem "
        "WHERE l_shipdate >= DATE'1995-01-01' GROUP BY l_suppkey"
    )
    assert "PushedFilters" in plan and "HashAggregate" in plan


def test_register_lake_autodiscovers(spark, sf_dir, tmp_path):
    """register_lake: flat parquet files AND a hive-partitioned subdir
    register under their stems; non-parquet clutter ignored."""
    import shutil

    import pyspark.sql.functions as F

    from quack_reduce_spark import Engine
    from quack_reduce_spark.inventory._util import load

    lake = tmp_path / "lake"
    lake.mkdir()
    shutil.copy(f"{sf_dir}/nation.parquet", lake / "nation.parquet")
    shutil.copy(f"{sf_dir}/region.parquet", lake / "region.parquet")
    (lake / "notes.txt").write_text("not a table")
    load(spark, sf_dir, "orders").limit(100).withColumn(
        "st", F.col("o_orderstatus")
    ).write.partitionBy("st").parquet(str(lake / "orders_by_status"))

    eng = Engine(spark=spark)
    names = eng.register_lake(str(lake))
    assert names == ["nation", "orders_by_status", "region"]
    assert eng.sql("SELECT COUNT(*) AS n FROM nation").records[0]["n"] == 25
    # the partition column is queryable (hive discovery)
    r = eng.sql("SELECT COUNT(DISTINCT st) AS n FROM orders_by_status")
    assert r.records[0]["n"] >= 2


def test_sql_many_concurrent_equals_serial(spark, sf_dir):
    # reference benchmark.py:207-211 fires 20 parallel Lambda calls;
    # the engine analog must return byte-identical envelopes for a
    # concurrent burst vs the same queries run serially
    from quack_reduce_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.register_dir(sf_dir, ["lineitem", "orders"])
    burst = [
        f"SELECT l_suppkey, COUNT(*) AS counts FROM lineitem "
        f"WHERE l_quantity > {q} GROUP BY l_suppkey "
        f"ORDER BY counts DESC, l_suppkey LIMIT 10"
        for q in (5, 15, 25, 35, 45)
    ] + [
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    ] * 3
    serial = [eng.sql(q) for q in burst]
    concurrent = eng.sql_many(burst, max_threads=4)
    assert [r.records for r in concurrent] == [r.records for r in serial]
    # every envelope is well-formed and tagged warm after the first
    assert all(r.metadata["warm"] for r in concurrent)


def test_fair_scheduler_mode_configured(spark):
    assert spark.conf.get("spark.scheduler.mode") == "FAIR"


def test_write_sharded_manifest_and_determinism(spark, sf_dir, tmp_path):
    # hash-sharded output: exact shard count, manifest totals match,
    # and shard membership is deterministic (same rows -> same shard
    # regardless of input partitioning)
    import json

    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.inventory._util import load

    eng = Engine(spark=spark)
    docs = load(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    manifest = eng.write_sharded(docs, out, shard_by="doc_id", n_shards=8)
    assert manifest["n_files"] == 8
    assert manifest["total_rows"] == docs.count()
    assert sum(manifest["files"].values()) == manifest["total_rows"]
    on_disk = json.load(open(out + "/_manifest.json"))
    assert on_disk == manifest

    # determinism: a re-write from a differently-partitioned input
    # produces identical per-shard doc_id sets
    def shard_sets(p):
        rows = (
            spark.read.parquet(p)
            .selectExpr("doc_id", "input_file_name() as f")
            .collect()
        )
        by = {}
        for r in rows:
            by.setdefault(r["f"].rsplit("/", 1)[-1], set()).add(r["doc_id"])
        return sorted(map(frozenset, by.values()), key=lambda s: min(s))

    out2 = str(tmp_path / "shards2")
    eng.write_sharded(docs.repartition(13), out2, shard_by="doc_id", n_shards=8)
    assert shard_sets(out) == shard_sets(out2)


def test_sql_many_isolates_failures(spark, sf_dir):
    # one bad query in a concurrent burst must not poison the others
    import pytest as _pytest

    from quack_reduce_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.register_dir(sf_dir, ["orders"])
    burst = [
        "SELECT COUNT(*) AS n FROM orders",
        "SELECT no_such_column FROM orders",
        "SELECT MAX(o_orderkey) AS m FROM orders",
    ]
    with _pytest.raises(Exception):
        eng.sql_many(burst, max_threads=3)
    # the engine session survives and still answers
    assert eng.sql("SELECT 1 AS one").records == [{"one": 1}]


def test_merge_upsert_replaces_and_appends(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.inventory._util import load

    eng = Engine(spark=spark)
    path = str(tmp_path / "tbl")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).limit(500)
    orders.write.parquet(path)

    # update 10 existing keys (price zeroed) + insert 5 new keys
    existing = orders.limit(10).select(
        "o_orderkey", F.lit(0.0).alias("o_totalprice")
    )
    new = spark.createDataFrame(
        [(10_000_000 + i, 1.5) for i in range(5)], "o_orderkey long, o_totalprice double"
    )
    stats = eng.merge_upsert(path, existing.unionByName(new), key="o_orderkey")
    assert stats["rows_after"] == 505
    assert stats["rows_replaced"] == 10
    back = spark.read.parquet(path)
    assert back.filter("o_totalprice = 0.0").count() == 10
    assert back.filter("o_orderkey >= 10000000").count() == 5
    assert back.select("o_orderkey").distinct().count() == 505


def test_merge_upsert_schema_evolution(spark, sf_dir, tmp_path):
    import pytest
    import pyspark.sql.functions as F

    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.inventory._util import load

    eng = Engine(spark=spark)
    path = str(tmp_path / "tbl")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).limit(100)
    orders.write.parquet(path)

    upd = spark.createDataFrame(
        [(10_000_000, 9.5, "HI")],
        "o_orderkey long, o_totalprice double, tier string",
    )
    # strict default rejects the unknown column with a clear message
    with pytest.raises(ValueError, match="tier"):
        eng.merge_upsert(path, upd, key="o_orderkey")

    stats = eng.merge_upsert(path, upd, key="o_orderkey", evolve_schema=True)
    assert stats["rows_after"] == 101
    back = spark.read.parquet(path)
    assert set(back.columns) == {"o_orderkey", "o_totalprice", "tier"}
    assert back.filter(F.col("tier").isNull()).count() == 100
    assert back.filter("tier = 'HI'").count() == 1

    # update missing a target column -> NULL there (mergeSchema contract)
    upd2 = spark.createDataFrame([(10_000_001, "LO")], "o_orderkey long, tier string")
    eng.merge_upsert(path, upd2, key="o_orderkey", evolve_schema=True)
    row = (
        spark.read.parquet(path).filter("o_orderkey = 10000001").collect()[0]
    )
    assert row["o_totalprice"] is None and row["tier"] == "LO"


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.inventory._util import load

    eng = Engine(spark=spark)
    path = str(tmp_path / "frag")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    before = sorted(map(tuple, li.collect()))
    li.repartition(40).write.parquet(path)  # fragment into 40 files

    stats = eng.compact(path, target_rows_per_file=1_000_000)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before


def test_catalog_roundtrip_and_versioned_entry(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.inventory._util import load

    root = str(tmp_path / "lake")
    eng = Engine(spark=spark)
    # a plain table, a csv table, and a versioned table
    orders = load(spark, sf_dir, "orders").limit(50)
    orders.write.parquet(f"{root}/orders_tbl")
    orders.write.option("header", "true").csv(f"{root}/orders_csv")
    eng.write_versioned(orders, f"{root}/orders_v", op="create")

    eng.register("orders_tbl", f"{root}/orders_tbl")
    eng.register("orders_csv", f"{root}/orders_csv", fmt="csv", header="true", inferSchema="true")
    eng.register("orders_v", f"{root}/orders_v")
    cat_path = eng.save_catalog(root)
    assert cat_path.endswith("_catalog.json")

    # a brand-new engine re-attaches everything from the manifest
    eng2 = Engine(spark=spark)
    names = eng2.load_catalog(root)
    assert names == ["orders_csv", "orders_tbl", "orders_v"]
    n = spark.sql("SELECT COUNT(*) AS n FROM orders_tbl").collect()[0]["n"]
    assert n == 50
    n_csv = spark.sql("SELECT COUNT(*) AS n FROM orders_csv").collect()[0]["n"]
    assert n_csv == 50
    n_v = spark.sql("SELECT COUNT(*) AS n FROM orders_v").collect()[0]["n"]
    assert n_v == 50

    # catalog survives a version bump on the versioned table: the
    # catalog stores the TABLE root, not a snapshot path
    eng.merge_upsert(
        f"{root}/orders_v",
        orders.withColumn("o_totalprice", F.lit(0.0)).limit(5),
        key="o_orderkey",
    )
    eng3 = Engine(spark=spark)
    eng3.load_catalog(root)
    zeroed = spark.sql(
        "SELECT COUNT(*) AS n FROM orders_v WHERE o_totalprice = 0.0"
    ).collect()[0]["n"]
    assert zeroed == 5


def test_load_catalog_missing_and_bad_version(spark, tmp_path):
    import json

    import pytest

    from quack_reduce_spark.engine import Engine

    eng = Engine(spark=spark)
    with pytest.raises(FileNotFoundError):
        eng.load_catalog(str(tmp_path / "nope"))
    root = str(tmp_path / "lake2")
    import os

    os.makedirs(root)
    with open(f"{root}/_catalog.json", "w") as f:
        json.dump({"version": 99, "tables": {}}, f)
    with pytest.raises(ValueError, match="version"):
        eng.load_catalog(root)


def test_registered_versioned_view_tracks_commits_and_survives_vacuum(
    spark, sf_dir, tmp_path
):
    import pyspark.sql.functions as F

    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.inventory._util import load

    eng = Engine(spark=spark)
    path = str(tmp_path / "tbl")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    eng.write_versioned(orders.limit(50), path, op="create")
    eng.register("vt", path)
    assert eng.sql("SELECT COUNT(*) AS n FROM vt").records[0]["n"] == 50

    # a maintenance commit moves the pointer; the view must follow
    eng.merge_upsert(
        path,
        spark.createDataFrame([(99_000_001, 1.0)], "o_orderkey long, o_totalprice double"),
        key="o_orderkey",
    )
    assert eng.sql("SELECT COUNT(*) AS n FROM vt").records[0]["n"] == 51

    # vacuum the old snapshot: the refreshed view must keep working
    eng.vacuum(path, keep=1)
    assert eng.sql("SELECT COUNT(*) AS n FROM vt").records[0]["n"] == 51


def test_commit_rewrite_recovers_crashed_swap(spark, sf_dir, tmp_path):
    """Simulate a crash between the two renames (table path absent,
    __old holds the only copy): the next maintenance call must restore
    the copy FIRST — not sweep it as debris — then apply its rewrite."""
    import os

    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.inventory._util import load

    eng = Engine(spark=spark)
    path = str(tmp_path / "tbl")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    orders.limit(40).write.parquet(path)

    # crash state: live dir renamed aside, replacement never arrived
    os.rename(path, path + "__old")
    assert not os.path.exists(path)

    upd = spark.createDataFrame([(5_000_000, 2.0)], "o_orderkey long, o_totalprice double")
    stats = eng.merge_upsert(path, upd, key="o_orderkey")
    assert stats["rows_after"] == 41
    assert spark.read.parquet(path).count() == 41
    assert not os.path.exists(path + "__old")


def test_write_clustered_end_to_end_prunable(spark, sf_dir, tmp_path):
    """Engine.write_clustered: one call -> range-clustered parquet +
    zone-map manifest; plain SQL range queries then prune and
    table_stats answers from metadata."""
    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.inventory._util import load

    eng = Engine(spark=spark)
    path = str(tmp_path / "clustered")
    orders = load(spark, sf_dir, "orders")
    n_files = eng.write_clustered(orders, path, ["o_orderdate"], n_files=10)
    assert n_files == 10
    eng.register("wc_orders", path)
    d = eng.df(
        "SELECT COUNT(*) AS n FROM wc_orders "
        "WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-07-01'"
    )
    want = spark.read.parquet(path).filter(
        "o_orderdate >= '1997-01-01' AND o_orderdate < '1997-07-01'"
    ).count()
    assert d.first()["n"] == want
    rep = eng.last_zonemap_report["wc_orders"]
    assert rep["files_read"] < rep["files_total"] == 10
    st = eng.table_stats("wc_orders")
    assert st["n_rows"] == orders.count() and st["n_files"] == 10


# -- metadata count pushdown (round 12) ---------------------------------------

from quack_reduce_spark.inventory._util import load  # noqa: E402


def test_count_where_metadata_plus_residual(spark, sf_dir, tmp_path):
    """A wide date-range count on a clustered table answers mostly from
    the manifest: fully-contained files contribute exact n_rows unread,
    only the O(1) boundary files are scanned, and the total equals the
    plain filtered count. A no-predicate count reads ZERO files."""
    import datetime as dt

    from quack_reduce_spark.operators import zonemaps as Z

    path = str(tmp_path / "cnt")
    orders = load(spark, sf_dir, "orders")
    (
        orders.repartitionByRange(12, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    Z.write_zonemap(spark, path, ["o_orderdate", "o_totalprice"])
    eng = Engine(spark=spark)
    eng.register("cnt_t", path)
    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1999, 6, 30)
    got = eng.count_where("cnt_t", {"o_orderdate": (lo, hi)})
    want = (
        spark.read.parquet(path)
        .filter(F.col("o_orderdate").between(lo, hi))
        .count()
    )
    assert got == want
    plan = eng.last_count_plan
    assert plan["source"] == "metadata+residual"
    assert plan["files_scanned"] <= 3 and plan["files_contained"] >= 3
    assert plan["rows_metadata"] + plan["rows_scanned"] == got
    assert eng.count_where("cnt_t") == orders.count()
    assert eng.last_count_plan["files_scanned"] == 0
    # an unclustered column still answers exactly, scanning everything
    got2 = eng.count_where("cnt_t", {"o_totalprice": (None, 50000.0)})
    assert got2 == spark.read.parquet(path).filter("o_totalprice <= 50000").count()
    spark.catalog.dropTempView("cnt_t")


def test_count_where_falls_back_on_stale_manifest(spark, sf_dir, tmp_path):
    """Files appended without manifest maintenance: the live-file-count
    guard refuses the metadata path and the plain scan still answers
    exactly (appended rows are never silently dropped)."""
    import datetime as dt

    from quack_reduce_spark.operators import zonemaps as Z

    path = str(tmp_path / "cnt_stale")
    orders = load(spark, sf_dir, "orders")
    orders.limit(1000).repartitionByRange(4, "o_orderdate").write.mode(
        "overwrite"
    ).parquet(path)
    Z.write_zonemap(spark, path, ["o_orderdate"])
    orders.limit(300).coalesce(1).write.mode("append").parquet(path)  # no maintenance
    eng = Engine(spark=spark)
    eng.register("cnt_s", path)
    got = eng.count_where(
        "cnt_s", {"o_orderdate": (dt.datetime(1990, 1, 1), dt.datetime(2050, 1, 1))}
    )
    assert got == spark.read.parquet(path).count()  # all rows in range
    assert eng.last_count_plan == {"source": "scan"}
    spark.catalog.dropTempView("cnt_s")


def test_count_where_fallback_matches_metadata_path_off_utc(
    spark, sf_dir, tmp_path
):
    """The scan fallback must interpret naive datetime bounds on
    session-zoned timestamp columns in the SESSION zone — the same
    epoch space the metadata+residual path uses — not through
    F.lit(datetime)'s driver-OS-zone rendering. With the session zone
    set off-UTC, the same arguments against the same data must count
    identically through both paths."""
    import datetime as dt

    from quack_reduce_spark.operators import zonemaps as Z
    from quack_reduce_spark.operators.zonemaps import _to_micros

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        orders = load(spark, sf_dir, "orders").withColumn(
            "o_ts", F.col("o_orderdate").cast("timestamp")
        )
        p_meta = str(tmp_path / "cw_m")
        p_scan = str(tmp_path / "cw_s")
        (
            orders.repartitionByRange(4, "o_ts")
            .sortWithinPartitions("o_ts")
            .write.mode("overwrite")
            .parquet(p_meta)
        )
        Z.write_zonemap(spark, p_meta, ["o_ts"])
        orders.coalesce(2).write.mode("overwrite").parquet(p_scan)
        eng = Engine(spark=spark)
        eng.register("cw_m", p_meta)
        eng.register("cw_s", p_scan)  # no manifest: scan fallback
        # midnight bounds: a driver-OS-zone (UTC) rendering shifts them
        # by 5h and drops/adds the boundary days' rows
        lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1997, 6, 30)
        got_meta = eng.count_where("cw_m", {"o_ts": (lo, hi)})
        assert eng.last_count_plan["source"] == "metadata+residual"
        got_scan = eng.count_where("cw_s", {"o_ts": (lo, hi)})
        assert eng.last_count_plan == {"source": "scan"}
        assert got_meta == got_scan
        tz = "America/New_York"
        want = (
            spark.read.parquet(p_meta)
            .where(
                (F.unix_micros(F.col("o_ts")) >= F.lit(_to_micros(lo, tz)))
                & (F.unix_micros(F.col("o_ts")) <= F.lit(_to_micros(hi, tz)))
            )
            .count()
        )
        assert got_meta == want > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
        spark.catalog.dropTempView("cw_m")
        spark.catalog.dropTempView("cw_s")


def test_count_where_in_list_composes_with_bloom(spark, sf_dir, tmp_path):
    """A point/IN count on a FINGERPRINTED key over a layout the key is
    not clustered by: bloom pruning keeps only the files that can hold
    the listed keys, the residual scan covers exactly those, and the
    total equals the plain isin count."""
    from quack_reduce_spark.operators import zonemaps as Z

    path = str(tmp_path / "cnt_in")
    orders = load(spark, sf_dir, "orders")
    orders.repartition(12, "o_custkey").write.mode("overwrite").parquet(path)
    Z.write_zonemap(spark, path, ["o_orderkey"], bloom_cols=["o_orderkey"])
    full = spark.read.parquet(path)
    n = full.count()
    keys = [
        r[0]
        for r in full.select("o_orderkey")
        .orderBy("o_orderkey")
        .offset(n // 3)
        .limit(2)
        .collect()
    ]
    eng = Engine(spark=spark)
    eng.register("cnt_in", path)
    got = eng.count_where("cnt_in", in_lists={"o_orderkey": keys})
    want = full.filter(F.col("o_orderkey").isin(keys)).count()
    assert got == want > 0
    plan = eng.last_count_plan
    assert plan["source"] == "metadata+residual"
    assert plan["files_scanned"] <= 4 < plan["files_total"] == 12
    with pytest.raises(ValueError, match="both constraints"):
        eng.count_where(
            "cnt_in",
            constraints={"o_orderkey": (0, 10)},
            in_lists={"o_orderkey": keys},
        )
    spark.catalog.dropTempView("cnt_in")
