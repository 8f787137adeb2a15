"""Contract tests for the data-quality inventory: the fixtures are
clean by construction, so every expectation must pass — and a
deliberately poisoned table must be caught."""

from __future__ import annotations

import pyspark.sql.functions as F

from quack_reduce_spark.inventory import dq


def test_expectations_all_pass_on_clean_fixture(spark, sf_dir):
    out = dq.dq_expectations(spark, sf_dir).collect()
    assert len(out) == 6
    assert all(r.passed for r in out), [r.check_name for r in out if not r.passed]
    assert all(r.n_violations == 0 for r in out)
    assert all(r.n_checked > 0 for r in out)


def test_referential_integrity_intact_on_fixture(spark, sf_dir):
    out = dq.dq_referential_integrity(spark, sf_dir).collect()
    assert len(out) == 4
    assert all(r.intact and r.n_orphans == 0 for r in out)


def test_partition_profile_monotone_months(spark, sf_dir):
    out = dq.dq_partition_profile(spark, sf_dir).collect()
    months = [r.month for r in out]
    assert months == sorted(months)
    for r in out:
        assert r.month <= r.first_date <= r.last_date
        assert r.null_prices == 0


def test_poisoned_table_is_caught(spark, sf_dir, tmp_path, monkeypatch):
    """Inject violations (null key, dup key, bad status, negative
    price) into a copy of orders and confirm each check counts them."""
    from quack_reduce_spark.inventory._util import load

    bad_rows = spark.createDataFrame(
        [
            (None, 1, "O", 10.0),
            (1, 1, "X", 10.0),  # dup of an existing key + bad status
            (98_765_432, 1, "O", -5.0),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    poisoned_dir = str(tmp_path / "sf_poison")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    orders.unionByName(bad_rows).write.parquet(f"{poisoned_dir}/orders.parquet")
    load(spark, sf_dir, "lineitem").write.parquet(
        f"{poisoned_dir}/lineitem.parquet"
    )

    out = {
        r.check_name: r for r in dq.dq_expectations(spark, poisoned_dir).collect()
    }
    assert out["orders_key_not_null"].n_violations == 1
    # n - count_distinct: the true duplicate plus the NULL key (which
    # distinct-count excludes) — both are uniqueness violations
    assert out["orders_key_unique"].n_violations == 2
    assert out["orders_status_accepted"].n_violations == 1
    assert out["orders_price_positive"].n_violations == 1
    assert not out["orders_key_not_null"].passed
