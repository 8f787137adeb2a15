"""Relational operator inventory — SURVEY.md §2 Tier A + Tier B.

Tier A rows (a01..a14) cover every operator the reference's own queries
exercise (citations in each docstring point into /root/reference).
Tier B rows (b_*) cover the delegated full-SQL surface reachable through
the reference's ``app.py:51`` passthrough: joins of every flavor,
aggregation variants, window functions, set ops, scalar function
families, subqueries, CTEs.

Scale notes (100 TB discipline):
- every query is a declarative DataFrame/SQL plan — no collect(), no
  driver-side loops; limits always follow an explicit total order;
- dimension joins broadcast the small side explicitly
  (``F.broadcast``) so the fact table never shuffles for a dim lookup;
- aggregates run as partial/final HashAggregate automatically — this IS
  the reference's hand-rolled map-reduce (``benchmark.py:185-240``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from quack_reduce_spark.inventory._util import load, register_views, rnd

# ---------------------------------------------------------------------------
# Tier A — operators exercised by the reference itself
# ---------------------------------------------------------------------------


def a01_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A5: single-file parquet scan + projection (quack.py:145, app.py:51).

    Column pruning reaches the parquet reader (ReadSchema shows only the
    three columns).
    """
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("qty")
    )


def a04_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: timestamp-range predicate (reference Makefile:27, README.md:100).

    The filter is pushed to the parquet scan (PushedFilters) → row-group
    skipping via min/max stats at scale.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-03-01"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.date_trunc("day", F.col("l_shipdate")).alias("ship_day"),
        "l_quantity",
    )


def a05_projection_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: computed projection + alias (benchmark.py:134-136)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
    )


def a06_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: grouped COUNT(*) — the reference's core query shape
    (benchmark.py:133-141; trips_by_pickup_location.sql:1-6).

    Physical plan = HashAggregate(partial) per split → shuffle →
    HashAggregate(final): exactly the reference's manual map-reduce
    (benchmark.py:185-240) with zero custom code (SURVEY §2 A10).
    """
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("counts"))
    )


def a07_global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: ungrouped scalar COUNT(*) (quack.py:146, dashboard.py:37)."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("counts"))


def a09_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A6+A8+A9: the flagship scan→filter→group→count→sort→limit
    (reference Makefile:27 / README.md:100).

    Plans as TakeOrderedAndProject — top-k without a full sort.
    Tie-broken on the group key so LIMIT is deterministic (SURVEY §7
    "what's hard" #2).
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("counts"))
        .orderBy(F.col("counts").desc(), F.col("l_suppkey").asc())
        .limit(10)
    )


def a14_derived_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: derive a partition key from a timestamp (run_me_first.py:95),
    then aggregate by it (month granularity to keep cardinality bounded).
    """
    return (
        load(spark, sf_dir, "lineitem")
        .withColumn("ship_month", F.date_trunc("month", F.col("l_shipdate")))
        .groupBy("ship_month")
        .agg(F.count(F.lit(1)).alias("counts"))
    )


# ---------------------------------------------------------------------------
# Tier B — the delegated full-SQL surface (reference app.py:51)
# ---------------------------------------------------------------------------


def b_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregate battery: SUM/AVG/MIN/MAX/COUNT per group.

    Partial/final agg split is automatic; rounded to 4 decimals for
    cross-engine float parity (sums of 4-decimal quantities can never sit
    on a round-to-4 boundary, so rounding is fp-noise-proof).
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 4).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def b_join_inner_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (orders ⋈ customer) + grouped agg.

    Shuffle join on o_custkey/c_custkey; at 100 TB both sides hash-
    partition on the key — AQE picks broadcast if customer fits.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rnd(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def b_join_star_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim chain: lineitem ⋈ supplier ⋈ nation ⋈ region.

    All three dims are explicitly broadcast — the 100 TB fact table is
    never shuffled; the whole chain is one scan + three BroadcastHashJoins.
    """
    li = load(spark, sf_dir, "lineitem")
    supplier = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region"))
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        )
    )


def b_join_left_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def b_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one URGENT order."""
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def b_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def b_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid equi + inequality (theta) join: supplier/customer pairs in
    the same nation where the supplier out-balances the customer.

    The equi part keys the shuffle; the inequality is a post-join filter,
    so this stays a hash join (not a nested-loop cross product) at scale.
    """
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    cond = (supplier.s_nationkey == customer.c_nationkey) & (
        supplier.s_acctbal > customer.c_acctbal
    )
    return (
        supplier.join(customer, cond, "inner")
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_outbalanced"))
    )


def b_join_interval_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key) via the banded composite: 25
    overlapping acctbal intervals derived from nation, customers
    point-joined into them. A naive inequality join here would plan
    BroadcastNestedLoopJoin — O(|cust| x |intervals|); banding turns
    it into a linear shuffle hash join (operators/rangejoin.py)."""
    from quack_reduce_spark.operators.rangejoin import point_in_interval_join

    nation = load(spark, sf_dir, "nation")
    intervals = nation.select(
        "n_nationkey",
        (F.lit(-1000.0) + F.col("n_nationkey") * 440.0).alias("lo"),
        (F.lit(-1000.0) + F.col("n_nationkey") * 440.0 + 880.0).alias("hi"),
    )
    customer = load(spark, sf_dir, "customer")
    return (
        point_in_interval_join(customer, intervals, "c_acctbal", "lo", "hi", band_width=440.0)
        .groupBy("n_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .orderBy("n_nationkey")
    )


def b_setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two homogeneous projections."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    c = customer.select(
        F.col("c_custkey").alias("entity_key"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = supplier.select(
        F.col("s_suppkey").alias("entity_key"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionAll(s)


def b_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of nation keys present on both sides."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


def b_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


def b_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (expands to two-phase agg physically)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


def b_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (filter over aggregate output)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), rnd(F.sum("o_totalprice"), 2).alias("spend"))
        .filter(F.col("n_orders") >= 3)
    )


def b_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER ranking within partitions; top-2 orders per customer.

    Tie-broken on o_orderkey so row_number is total-order deterministic.
    """
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def b_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytic: per-user value delta over event time."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return events.select(
        "event_id",
        "user_id",
        rnd(F.col("value") - F.lag("value", 1).over(w), 4).alias("value_delta"),
    )


def b_window_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over an explicit ROWS frame: per-customer running spend."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        rnd(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


def b_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → priority → grand total)."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), rnd(F.sum("o_totalprice"), 2).alias("total"))
    )


def b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all grouping-set combinations)."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def b_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via spark.sql (Tier-B SQL surface)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def b_expr_case_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN + string function battery (LOWER/SUBSTR/CONCAT/LIKE/
    REPLACE/TRIM/LENGTH) — reference Tier-B scalar surface."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower(F.col("p_brand")).alias("brand_lower"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.length(F.col("p_name")).alias("name_len"),
        F.when(F.col("p_size") >= 30, F.lit("large"))
        .when(F.col("p_size") >= 10, F.lit("medium"))
        .otherwise(F.lit("small"))
        .alias("size_class"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
    )


def b_datetime_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction + truncation + arithmetic."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofmonth("o_orderdate").alias("dom"),
            F.date_trunc("quarter", F.col("o_orderdate")).alias("qtr_start"),
            F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
            "o_totalprice",
        )
        .groupBy("yr", "mo")
        .agg(F.count(F.lit(1)).alias("n"), rnd(F.sum("o_totalprice"), 2).alias("total"))
    )


def b_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar + statistical aggregate battery."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            rnd(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_dev"),
            F.ceil(F.col("l_quantity")).alias("qty_ceil"),
            F.floor(F.col("l_discount") * 100).alias("disc_pct"),
            (F.ln(F.col("l_extendedprice") + 1.0)).alias("log_price"),
            (F.pow(F.col("l_tax") + 1.0, 2.0)).alias("tax_sq"),
        )
        .groupBy("l_returnflag")
        .agg(
            rnd(F.avg("abs_dev"), 4).alias("avg_abs_dev"),
            rnd(F.stddev_samp("log_price"), 6).alias("sd_log_price"),
            rnd(F.var_samp("tax_sq"), 6).alias("var_tax_sq"),
            F.sum("qty_ceil").cast("double").alias("sum_qty_ceil"),
            F.sum("disc_pct").cast("double").alias("sum_disc_pct"),
        )
    )


def b_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (events.props)."""
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            rnd(F.avg("k"), 4).alias("avg_k"),
        )
    )


def b_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery via spark.sql (Catalyst rewrites to
    a left-semi join — RewritePredicateSubquery)."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 400000
        )
        """
    )


def b_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above the global mean price.

    Row-level comparison against an exact aggregate; output is stable
    because avg differences below fp noise cannot flip the comparison
    for realistic data (prices are cents, the mean is not adversarial).
    """
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


def b_cte_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH-clause composition (two chained CTEs) — the dbt two-model
    pipeline (SURVEY §3 EP3) expressed as SQL."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        WITH by_supp AS (
            SELECT l_suppkey, COUNT(*) AS counts
            FROM lineitem
            GROUP BY l_suppkey
        ),
        ranked AS (
            SELECT l_suppkey, counts,
                   ROW_NUMBER() OVER (ORDER BY counts DESC, l_suppkey ASC) AS rn
            FROM by_supp
        )
        SELECT l_suppkey, counts, rn FROM ranked WHERE rn <= 25
        """
    )


def b_explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST / posexplode of an array column (embeddings.embedding)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "val")
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))


def b_higher_order_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: transform + aggregate (L2 norm) and
    filter (count of positive components) — no UDF, all JVM-side."""
    emb = load(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        "label",
        rnd(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


QUERIES = {
    "a01_scan_project": a01_scan_project,
    "a04_filter_range": a04_filter_range,
    "a05_projection_expr": a05_projection_expr,
    "a06_group_count": a06_group_count,
    "a07_global_count": a07_global_count,
    "a09_topk": a09_topk,
    "a14_derived_date": a14_derived_date,
    "b_agg_pricing_summary": b_agg_pricing_summary,
    "b_join_inner_group": b_join_inner_group,
    "b_join_star_broadcast": b_join_star_broadcast,
    "b_join_left_counts": b_join_left_counts,
    "b_join_semi": b_join_semi,
    "b_join_anti": b_join_anti,
    "b_join_range": b_join_range,
    "b_join_interval_band": b_join_interval_band,
    "b_setop_union_all": b_setop_union_all,
    "b_setop_intersect": b_setop_intersect,
    "b_setop_except": b_setop_except,
    "b_distinct_agg": b_distinct_agg,
    "b_having": b_having,
    "b_window_rank": b_window_rank,
    "b_window_lag": b_window_lag,
    "b_window_frame_sum": b_window_frame_sum,
    "b_rollup": b_rollup,
    "b_cube": b_cube,
    "b_grouping_sets": b_grouping_sets,
    "b_expr_case_string": b_expr_case_string,
    "b_datetime_fns": b_datetime_fns,
    "b_math_fns": b_math_fns,
    "b_json_extract": b_json_extract,
    "b_subquery_exists": b_subquery_exists,
    "b_subquery_scalar": b_subquery_scalar,
    "b_cte_query": b_cte_query,
    "b_explode_array": b_explode_array,
    "b_higher_order_fns": b_higher_order_fns,
}


ORACLES = {
    "a01_scan_project": """
        SELECT l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem
    """,
    "a04_filter_range": """
        SELECT l_orderkey, l_linenumber, date_trunc('day', l_shipdate) AS ship_day, l_quantity
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-03-01'
    """,
    "a05_projection_expr": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1.0 - l_discount) AS revenue
        FROM lineitem
    """,
    "a06_group_count": """
        SELECT l_suppkey, COUNT(*) AS counts FROM lineitem GROUP BY l_suppkey
    """,
    "a07_global_count": """
        SELECT COUNT(*) AS counts FROM lineitem
    """,
    "a09_topk": """
        SELECT l_suppkey, COUNT(*) AS counts
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        ORDER BY counts DESC, l_suppkey ASC
        LIMIT 10
    """,
    "a14_derived_date": """
        SELECT date_trunc('month', l_shipdate) AS ship_month, COUNT(*) AS counts
        FROM lineitem GROUP BY 1
    """,
    "b_agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               FLOOR((SUM(l_quantity)) * 1e4 + 0.5) / 1e4 AS sum_qty,
               FLOOR((SUM(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS sum_base_price,
               FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS sum_disc_price,
               FLOOR((AVG(l_quantity)) * 1e4 + 0.5) / 1e4 AS avg_qty,
               FLOOR((AVG(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS avg_price,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "b_join_inner_group": """
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               FLOOR((SUM(o_totalprice)) * 1e2 + 0.5) / 1e2 AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "b_join_star_broadcast": """
        SELECT r_name,
               COUNT(*) AS n_items,
               FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "b_join_left_counts": """
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "b_join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
    """,
    "b_join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "b_join_interval_band": """
        WITH intervals AS (
            SELECT n_nationkey,
                   -1000.0 + n_nationkey * 440.0 AS lo,
                   -1000.0 + n_nationkey * 440.0 + 880.0 AS hi
            FROM nation
        )
        SELECT n_nationkey,
               COUNT(*) AS n_customers,
               FLOOR((AVG(c_acctbal)) * 1e4 + 0.5) / 1e4 AS avg_bal
        FROM customer JOIN intervals
          ON c_acctbal >= lo AND c_acctbal < hi
        GROUP BY n_nationkey
        ORDER BY n_nationkey
    """,
    "b_join_range": """
        SELECT s_suppkey, COUNT(*) AS n_outbalanced
        FROM supplier JOIN customer
          ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        GROUP BY s_suppkey
    """,
    "b_setop_union_all": """
        SELECT c_custkey AS entity_key, 'customer' AS kind, c_acctbal AS acctbal FROM customer
        UNION ALL
        SELECT s_suppkey AS entity_key, 'supplier' AS kind, s_acctbal AS acctbal FROM supplier
    """,
    "b_setop_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "b_setop_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "b_distinct_agg": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps
        FROM lineitem GROUP BY l_returnflag
    """,
    "b_having": """
        SELECT o_custkey, COUNT(*) AS n_orders, FLOOR((SUM(o_totalprice)) * 1e2 + 0.5) / 1e2 AS spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    """,
    "b_window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rn
            FROM orders
        ) t WHERE rn <= 2
    """,
    "b_window_lag": """
        SELECT event_id, user_id,
               FLOOR((value - LAG(value, 1) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               )) * 1e4 + 0.5) / 1e4 AS value_delta
        FROM events
    """,
    "b_window_frame_sum": """
        SELECT o_custkey, o_orderkey,
               FLOOR((SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )) * 1e2 + 0.5) / 1e2 AS running_spend
        FROM orders
    """,
    "b_rollup": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               FLOOR((SUM(o_totalprice)) * 1e2 + 0.5) / 1e2 AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "b_cube": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "b_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "b_expr_case_string": """
        SELECT p_partkey,
               LOWER(p_brand) AS brand_lower,
               SUBSTRING(p_name, 1, 8) AS name_prefix,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               CAST(LENGTH(p_name) AS INT) AS name_len,
               CASE WHEN p_size >= 30 THEN 'large'
                    WHEN p_size >= 10 THEN 'medium'
                    ELSE 'small' END AS size_class,
               (p_type LIKE '%BRASS%') AS is_brass
        FROM part
    """,
    "b_datetime_fns": """
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
               COUNT(*) AS n,
               FLOOR((SUM(o_totalprice)) * 1e2 + 0.5) / 1e2 AS total
        FROM orders GROUP BY 1, 2
    """,
    "b_math_fns": """
        SELECT l_returnflag,
               FLOOR((AVG(ROUND(ABS(l_extendedprice - 1000.0), 2))) * 1e4 + 0.5) / 1e4 AS avg_abs_dev,
               FLOOR((STDDEV_SAMP(LN(l_extendedprice + 1.0))) * 1e6 + 0.5) / 1e6 AS sd_log_price,
               FLOOR((VAR_SAMP(POW(l_tax + 1.0, 2.0))) * 1e6 + 0.5) / 1e6 AS var_tax_sq,
               CAST(SUM(CEIL(l_quantity)) AS DOUBLE) AS sum_qty_ceil,
               CAST(SUM(FLOOR(l_discount * 100)) AS DOUBLE) AS sum_disc_pct
        FROM lineitem GROUP BY l_returnflag
    """,
    "b_json_extract": """
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               FLOOR((AVG(CAST(json_extract_string(props, '$.k') AS INT))) * 1e4 + 0.5) / 1e4 AS avg_k
        FROM events GROUP BY event_type
    """,
    "b_subquery_exists": """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 400000
        )
    """,
    "b_subquery_scalar": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    "b_cte_query": """
        WITH by_supp AS (
            SELECT l_suppkey, COUNT(*) AS counts
            FROM lineitem
            GROUP BY l_suppkey
        ),
        ranked AS (
            SELECT l_suppkey, counts,
                   ROW_NUMBER() OVER (ORDER BY counts DESC, l_suppkey ASC) AS rn
            FROM by_supp
        )
        SELECT l_suppkey, counts, rn FROM ranked WHERE rn <= 25
    """,
    "b_explode_array": """
        SELECT vec_id, CAST(i - 1 AS INT) AS pos, CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, generate_series(1, 64) t(i)
        WHERE vec_id < 20
    """,
    "b_higher_order_fns": """
        SELECT vec_id, label,
               FLOOR((SQRT(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) * 1e6 + 0.5) / 1e6 AS l2_norm,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
        FROM embeddings
    """,
}
