"""Query result cache on the envelope surface (round 13): the
reference's benchmark "cached" mode (``benchmark.py:254-265``) with
real invalidation — identical ``(query, limit)`` over unchanged source
tables returns the stored records WITHOUT executing (zero Spark jobs),
and any source commit invalidates. Declines are half the contract:
nondeterministic expressions, commands, and un-tokenizable tables must
never cache."""

from __future__ import annotations

from quack_reduce_spark import engine as E
from quack_reduce_spark.engine import Engine
from quack_reduce_spark.inventory._util import load


def _eng(spark, sf_dir, tmp_path, name):
    src = str(tmp_path / name)
    load(spark, sf_dir, "orders").write.mode("overwrite").parquet(src)
    eng = Engine(spark=spark)
    eng.register("orders", src)
    return eng, src


def test_result_cache_hit_runs_zero_jobs(spark, sf_dir, tmp_path):
    eng, _src = _eng(spark, sf_dir, tmp_path, "rc1")
    q = (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )
    r1 = eng.sql(q)
    assert r1.metadata["result_cache"] == {"hit": False, "stored": True}
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    r2 = eng.sql(q)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert r2.metadata["result_cache"] == {"hit": True}
    assert after == before  # the hit scheduled NO Spark job
    assert r2.records == r1.records
    assert r2.metadata["warm"] is True
    # records are copies: mutating one envelope can't poison the cache
    r2.records[0]["n"] = -1
    assert eng.sql(q).records == r1.records
    spark.catalog.dropTempView("orders")


def test_result_cache_invalidates_on_commit(spark, sf_dir, tmp_path):
    eng, src = _eng(spark, sf_dir, tmp_path, "rc2")
    q = "SELECT COUNT(*) AS n FROM orders"
    n0 = eng.sql(q).records[0]["n"]
    load(spark, sf_dir, "orders").limit(5).write.mode("append").parquet(src)
    r = eng.sql(q)
    assert r.metadata["result_cache"]["hit"] is False
    # the re-registered live listing then caches + hits the new state
    eng.register("orders", src)
    n1 = eng.sql(q).records[0]["n"]
    assert n1 == n0 + 5
    assert eng.sql(q).metadata["result_cache"]["hit"] is True
    spark.catalog.dropTempView("orders")


def test_result_cache_declines(spark, sf_dir, tmp_path):
    """rand() re-draws, commands replay nothing, limits key
    separately, and result_cache=False disables wholesale."""
    eng, _src = _eng(spark, sf_dir, tmp_path, "rc3")
    r1 = eng.sql("SELECT rand() AS x FROM orders LIMIT 1")
    assert r1.metadata["result_cache"] == {"hit": False, "stored": False}
    assert eng.sql("SELECT rand() AS x FROM orders LIMIT 1").metadata[
        "result_cache"
    ]["hit"] is False
    eng.sql("CREATE OR REPLACE TEMP VIEW rc_vv AS SELECT 1 AS one")
    r2 = eng.sql("CREATE OR REPLACE TEMP VIEW rc_vv AS SELECT 1 AS one")
    assert r2.metadata["result_cache"]["hit"] is False
    q = "SELECT o_orderkey FROM orders ORDER BY o_orderkey"
    assert len(eng.sql(q, limit=2).records) == 2
    r3 = eng.sql(q, limit=3)
    assert r3.metadata["result_cache"]["hit"] is False
    assert len(eng.sql(q, limit=2).records) == 2  # hit, still capped at 2
    off = Engine(spark=spark, result_cache=False)
    off.register("orders", _src)
    assert "result_cache" not in off.sql(q).metadata
    assert "result_cache" not in off.sql(q).metadata
    spark.catalog.dropTempView("orders")


def test_result_cache_lru_bound(spark, sf_dir, tmp_path):
    eng, _src = _eng(spark, sf_dir, tmp_path, "rc4")
    old_max = E.RESULT_CACHE_MAX
    E.RESULT_CACHE_MAX = 2
    try:
        qa = "SELECT 1 AS a FROM orders LIMIT 1"
        qb = "SELECT 2 AS b FROM orders LIMIT 1"
        qc = "SELECT 3 AS c FROM orders LIMIT 1"
        eng.sql(qa)
        eng.sql(qb)
        assert eng.sql(qa).metadata["result_cache"]["hit"]  # LRU touch
        eng.sql(qc)  # evicts qb (least recently used)
        assert eng.sql(qa).metadata["result_cache"]["hit"]
        assert eng.sql(qb).metadata["result_cache"]["hit"] is False
    finally:
        E.RESULT_CACHE_MAX = old_max
    spark.catalog.dropTempView("orders")

def test_result_cache_row_cap(spark, sf_dir, tmp_path):
    """An uncapped (limit=None) result above RESULT_CACHE_MAX_ROWS is
    never stored — the cache must not pin large result sets."""
    eng, _src = _eng(spark, sf_dir, tmp_path, "rc5")
    old = E.RESULT_CACHE_MAX_ROWS
    E.RESULT_CACHE_MAX_ROWS = 10
    try:
        q = "SELECT o_orderkey FROM orders ORDER BY o_orderkey"
        r = eng.sql(q, limit=None)
        assert len(r.records) > 10
        assert r.metadata["result_cache"] == {"hit": False, "stored": False}
        assert eng.sql(q, limit=None).metadata["result_cache"]["hit"] is False
        # a capped variant still caches
        assert eng.sql(q, limit=5).metadata["result_cache"]["stored"]
        assert eng.sql(q, limit=5).metadata["result_cache"]["hit"]
    finally:
        E.RESULT_CACHE_MAX_ROWS = old
    spark.catalog.dropTempView("orders")
