"""Relational operator inventory, batch 2 — SURVEY.md §2 Tier B depth.

Second sweep over the delegated-SQL surface (reference ``app.py:51``):
outer/cross joins, exact percentiles, conditional & ordered-set
aggregates, string/regex battery 2, date battery 2, ranking-function
battery, RANGE frames, null-handling semantics, pivot.

Determinism discipline is the same as batch 1: every LIMIT follows a
total order; ties in window ORDER BYs are broken on a unique key;
floats that cross the engine boundary go through rnd() (see
functions/numeric.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from quack_reduce_spark.inventory._util import load, register_views, rnd


def b2_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation supplier/customer rollups —
    preserves nations present on only one side."""
    sup = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return (
        sup.join(cust, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
    )


def b2_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join: every region against the global nation count."""
    region = load(spark, sf_dir, "region")
    totals = load(spark, sf_dir, "nation").agg(F.count(F.lit(1)).alias("n_nations"))
    return region.crossJoin(totals).select("r_name", "n_nations")


def b2_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            rnd(F.percentile(F.col("l_quantity"), F.lit(0.5)), 4).alias("p50_qty"),
            rnd(F.percentile(F.col("l_extendedprice"), F.lit(0.9)), 4).alias("p90_price"),
            rnd(F.percentile(F.col("l_extendedprice"), F.lit(0.99)), 4).alias("p99_price"),
        )
    )


def b2_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: count_if / bool_or / bool_and / CASE-sum."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_big"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            rnd(F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).otherwise(0.0)), 2).alias("urgent_value"),
        )
    )


def b2_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): nations per
    region, sorted — deterministic via array_sort(collect_list)."""
    nation = load(spark, sf_dir, "nation")
    region = F.broadcast(load(spark, sf_dir, "region"))
    return (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
    )


def b2_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (fuzzy matching primitive for entity resolution)."""
    return (
        load(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            rnd(F.avg(F.levenshtein(F.col("p_type"), F.lit("STANDARD BRASS"))), 4).alias("avg_dist"),
            F.min(F.levenshtein(F.col("p_name"), F.col("p_brand"))).alias("min_name_dist"),
        )
    )


def b2_string_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery 2: pad/repeat/reverse/translate/position/split."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.lpad(F.col("p_brand"), 12, "*").alias("brand_padded"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.translate(F.col("p_type"), "AEIOU", "aeiou").alias("type_translated"),
        F.instr(F.col("p_type"), "BRASS").cast("int").alias("brass_pos"),
        F.size(F.split(F.col("p_type"), " ")).alias("type_words"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
    )


def b2_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction + cast."""
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.regexp_extract(F.col("p_brand"), r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
            F.regexp_replace(F.col("p_type"), r"[AEIOU]", "_").alias("type_masked"),
        )
    )


def b2_date_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date battery 2: dow/week/last_day/datediff/interval add."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        (F.dayofweek(F.col("o_orderdate")) - 1).alias("dow"),  # 0=Sunday, both engines
        F.weekofyear(F.col("o_orderdate")).alias("iso_week"),
        F.last_day(F.col("o_orderdate")).cast("timestamp").alias("month_end"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.to_date("o_orderdate")).alias("days_to_1999"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus_3mo"),
    )


def b2_null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: coalesce / nullif / null-aware counts over an
    outer join that manufactures NULLs."""
    customer = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    joined = customer.join(big, customer.c_custkey == big.o_custkey, "left")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_big_orders"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_null"),
        rnd(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias("big_value"),
        F.count(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))).alias("n_nonbuilding"),
    )


def b2_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking battery: dense_rank / percent_rank / cume_dist / ntile.

    rank functions are tie-stable by definition; ntile is tie-broken on
    the key for determinism.
    """
    orders = load(spark, sf_dir, "orders")
    w_ties = Window.partitionBy("o_orderstatus").orderBy(F.col("o_orderpriority"))
    w_unique = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.dense_rank().over(w_ties).alias("prio_dense_rank"),
        rnd(F.percent_rank().over(w_ties), 6).alias("prio_pct_rank"),
        rnd(F.cume_dist().over(w_ties), 6).alias("prio_cume_dist"),
        F.ntile(4).over(w_unique).alias("price_quartile"),
    )


def b2_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-customer 30-day trailing spend.

    Spark range frames need a numeric ordering column → order by epoch
    seconds with a [-30 days, 0] range; peers at equal timestamps are
    all included, so ties don't break determinism.
    """
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate")))
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        rnd(F.sum("o_totalprice").over(w), 2).alias("trailing_30d_spend"),
    )


def b2_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation battery: first_value / last_value / nth_value / lead
    with default, over a deterministic (tie-broken) frame."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_seq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first_value(F.col("o_orderkey")).over(w).alias("first_order"),
        F.last_value(F.col("o_orderkey")).over(w).alias("last_order"),
        F.coalesce(F.nth_value(F.col("o_orderkey"), 2).over(w), F.lit(-1)).alias("second_order"),
        F.lead(F.col("o_orderkey"), 1, -1).over(w_seq).alias("next_order"),
    )


def b2_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation / sample covariance."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            rnd(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            rnd(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
        )
    )


def b2_histogram_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram bucketing via portable arithmetic (floor(x/width))."""
    return (
        load(spark, sf_dir, "orders")
        .select((F.floor(F.col("o_totalprice") / 50000.0)).cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def b2_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by status x priority (fixed value list —
    at scale an unbounded pivot would need a distinct pass first)."""
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [p for p in prios])
    )


def b2_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) predicate (Catalyst: rewritten to left-semi)."""
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        """
    )


def b2_setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops: INTERSECT ALL / EXCEPT ALL preserve duplicate
    counts (vs the distinct variants in b_setop_*). Probe: nation keys
    of customers vs suppliers, duplicates meaningful."""
    cust_nations = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    supp_nations = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    both = cust_nations.intersectAll(supp_nations).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    only = cust_nations.exceptAll(supp_nations).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_except_all")
    )
    return both.join(only, "nationkey", "full_outer").na.fill(0).orderBy("nationkey")


def b2_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT + OFFSET pagination over a deterministic total order."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(10)
        .limit(15)
        .select("o_orderkey", "o_totalprice")
    )


def b2_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample via Knuth multiplicative hashing on the
    row key. Unlike ``df.sample`` (per-partition RNG — result depends
    on the split layout), a seeded-hash predicate samples the SAME rows
    on any cluster size, so pipelines stay reproducible at 100 TB; it
    also pushes down to the scan like any filter."""
    li = load(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 8 + F.col("l_linenumber")  # unique per row
    bucket = F.pmod(key * F.lit(2654435761), F.lit(100))
    return (
        li.filter(bucket < 5)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


def b2_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()/summary()-shaped profile battery as explicit aggs
    (count / mean / stddev / min / max / n_distinct per measure)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        rnd(F.avg("l_quantity"), 6).alias("qty_mean"),
        rnd(F.stddev_samp("l_quantity"), 6).alias("qty_std"),
        rnd(F.min("l_quantity"), 2).alias("qty_min"),
        rnd(F.max("l_quantity"), 2).alias("qty_max"),
        rnd(F.avg("l_extendedprice"), 6).alias("price_mean"),
        rnd(F.stddev_samp("l_extendedprice"), 6).alias("price_std"),
        F.count_distinct(F.col("l_suppkey")).alias("n_suppliers"),
    )


def b2_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting demo through the correctness gate: the skew-mitigation
    join (operators/skew.py — fact key salted into 8 sub-keys, dim
    replicated per salt) must return EXACTLY the rows of the plain
    equi-join it replaces. Oracle is the plain join + aggregate; the
    plan-shape assertions live in tests/test_approx_and_skew.py."""
    from quack_reduce_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    return (
        salted_join(li, sup, on="suppkey", salt_buckets=8)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rnd(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


QUERIES = {
    "b2_skew_salted_join": b2_skew_salted_join,
    "b2_setop_all_variants": b2_setop_all_variants,
    "b2_limit_offset": b2_limit_offset,
    "b2_sample_hash": b2_sample_hash,
    "b2_summary_stats": b2_summary_stats,
    "b2_join_full_outer": b2_join_full_outer,
    "b2_join_cross": b2_join_cross,
    "b2_percentiles": b2_percentiles,
    "b2_conditional_agg": b2_conditional_agg,
    "b2_string_agg": b2_string_agg,
    "b2_levenshtein": b2_levenshtein,
    "b2_string_fns2": b2_string_fns2,
    "b2_regexp_extract": b2_regexp_extract,
    "b2_date_fns2": b2_date_fns2,
    "b2_null_fns": b2_null_fns,
    "b2_window_ranks": b2_window_ranks,
    "b2_window_range_frame": b2_window_range_frame,
    "b2_window_nav": b2_window_nav,
    "b2_corr_covar": b2_corr_covar,
    "b2_histogram_bucket": b2_histogram_bucket,
    "b2_pivot": b2_pivot,
    "b2_in_subquery": b2_in_subquery,
}


ORACLES = {
    "b2_skew_salted_join": """
        SELECT s_nationkey, COUNT(*) AS n_items,
               FLOOR((SUM(l_quantity)) * 1e4 + 0.5) / 1e4 AS sum_qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
    """,
    "b2_setop_all_variants": """
        WITH cn AS (SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer),
             sn AS (SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier),
             isect AS (
                 SELECT nationkey, COUNT(*) AS n_intersect_all
                 FROM (SELECT * FROM cn INTERSECT ALL SELECT * FROM sn)
                 GROUP BY nationkey
             ),
             exc AS (
                 SELECT nationkey, COUNT(*) AS n_except_all
                 FROM (SELECT * FROM cn EXCEPT ALL SELECT * FROM sn)
                 GROUP BY nationkey
             )
        SELECT COALESCE(isect.nationkey, exc.nationkey) AS nationkey,
               COALESCE(n_intersect_all, 0) AS n_intersect_all,
               COALESCE(n_except_all, 0) AS n_except_all
        FROM isect FULL OUTER JOIN exc ON isect.nationkey = exc.nationkey
        ORDER BY nationkey
    """,
    "b2_limit_offset": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 15 OFFSET 10
    """,
    "b2_sample_hash": """
        SELECT l_returnflag,
               COUNT(*) AS n_sampled,
               FLOOR((AVG(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS avg_price
        FROM lineitem
        WHERE ((l_orderkey * 8 + l_linenumber) * 2654435761) % 100 < 5
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "b2_summary_stats": """
        SELECT COUNT(*) AS n_rows,
               FLOOR((AVG(l_quantity)) * 1e6 + 0.5) / 1e6 AS qty_mean,
               FLOOR((stddev_samp(l_quantity)) * 1e6 + 0.5) / 1e6 AS qty_std,
               FLOOR((MIN(l_quantity)) * 1e2 + 0.5) / 1e2 AS qty_min,
               FLOOR((MAX(l_quantity)) * 1e2 + 0.5) / 1e2 AS qty_max,
               FLOOR((AVG(l_extendedprice)) * 1e6 + 0.5) / 1e6 AS price_mean,
               FLOOR((stddev_samp(l_extendedprice)) * 1e6 + 0.5) / 1e6 AS price_std,
               COUNT(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem
    """,
    "b2_join_full_outer": """
        WITH sup AS (
            SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
            FROM supplier GROUP BY 1
        ),
        cust AS (
            SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
            FROM customer GROUP BY 1
        )
        SELECT COALESCE(sup.nationkey, cust.nationkey) AS nationkey,
               COALESCE(n_suppliers, 0) AS n_suppliers,
               COALESCE(n_customers, 0) AS n_customers
        FROM sup FULL OUTER JOIN cust ON sup.nationkey = cust.nationkey
    """,
    "b2_join_cross": """
        SELECT r_name, n_nations
        FROM region CROSS JOIN (SELECT COUNT(*) AS n_nations FROM nation) t
    """,
    "b2_percentiles": """
        SELECT l_returnflag,
               FLOOR((quantile_cont(l_quantity, 0.5)) * 1e4 + 0.5) / 1e4 AS p50_qty,
               FLOOR((quantile_cont(l_extendedprice, 0.9)) * 1e4 + 0.5) / 1e4 AS p90_price,
               FLOOR((quantile_cont(l_extendedprice, 0.99)) * 1e4 + 0.5) / 1e4 AS p99_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "b2_conditional_agg": """
        SELECT o_orderstatus,
               CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
               bool_or(o_totalprice > 400000) AS any_big,
               bool_and(o_totalprice > 1000) AS all_over_1k,
               FLOOR((SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END)) * 1e2 + 0.5) / 1e2 AS urgent_value
        FROM orders GROUP BY o_orderstatus
    """,
    "b2_string_agg": """
        SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "b2_levenshtein": """
        SELECT p_brand,
               FLOOR((AVG(levenshtein(p_type, 'STANDARD BRASS'))) * 1e4 + 0.5) / 1e4 AS avg_dist,
               CAST(MIN(levenshtein(p_name, p_brand)) AS INT) AS min_name_dist
        FROM part GROUP BY p_brand
    """,
    "b2_string_fns2": """
        SELECT p_partkey,
               lpad(p_brand, 12, '*') AS brand_padded,
               reverse(p_brand) AS brand_rev,
               translate(p_type, 'AEIOU', 'aeiou') AS type_translated,
               CAST(instr(p_type, 'BRASS') AS INT) AS brass_pos,
               CAST(len(string_split(p_type, ' ')) AS INT) AS type_words,
               repeat('ab', 3) AS repeated
        FROM part
    """,
    "b2_regexp_extract": """
        SELECT p_partkey,
               CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
               regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_masked
        FROM part
    """,
    "b2_date_fns2": """
        SELECT o_orderkey,
               CAST(dayofweek(o_orderdate) AS INT) AS dow,
               CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
               CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT) AS days_to_1999,
               o_orderdate + INTERVAL 3 MONTH AS plus_3mo
        FROM orders
    """,
    "b2_null_fns": """
        SELECT c_mktsegment,
               COUNT(*) AS n_rows,
               COUNT(o_orderkey) AS n_big_orders,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               FLOOR((SUM(COALESCE(o_totalprice, 0.0))) * 1e2 + 0.5) / 1e2 AS big_value,
               COUNT(NULLIF(c_mktsegment, 'BUILDING')) AS n_nonbuilding
        FROM customer LEFT JOIN (
            SELECT * FROM orders WHERE o_totalprice > 450000
        ) big ON c_custkey = big.o_custkey
        GROUP BY c_mktsegment
    """,
    "b2_window_ranks": """
        SELECT o_orderkey, o_orderstatus,
               CAST(DENSE_RANK() OVER w_t AS INT) AS prio_dense_rank,
               FLOOR((PERCENT_RANK() OVER w_t) * 1e6 + 0.5) / 1e6 AS prio_pct_rank,
               FLOOR((CUME_DIST() OVER w_t) * 1e6 + 0.5) / 1e6 AS prio_cume_dist,
               CAST(NTILE(4) OVER w_u AS INT) AS price_quartile
        FROM orders
        WINDOW w_t AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority),
               w_u AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    "b2_window_range_frame": """
        SELECT o_orderkey, o_custkey,
               FLOOR((SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL '30 days' PRECEDING AND CURRENT ROW
               )) * 1e2 + 0.5) / 1e2 AS trailing_30d_spend
        FROM orders
    """,
    "b2_window_nav": """
        SELECT o_orderkey, o_custkey,
               FIRST_VALUE(o_orderkey) OVER w_full AS first_order,
               LAST_VALUE(o_orderkey) OVER w_full AS last_order,
               COALESCE(NTH_VALUE(o_orderkey, 2) OVER w_full, -1) AS second_order,
               COALESCE(LEAD(o_orderkey, 1) OVER w_seq, -1) AS next_order
        FROM orders
        WINDOW w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
               w_seq AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    "b2_corr_covar": """
        SELECT l_returnflag,
               FLOOR((corr(l_quantity, l_extendedprice)) * 1e6 + 0.5) / 1e6 AS corr_qty_price,
               FLOOR((covar_samp(l_quantity, l_discount)) * 1e6 + 0.5) / 1e6 AS covar_qty_disc
        FROM lineitem GROUP BY l_returnflag
    """,
    "b2_histogram_bucket": """
        SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INT) AS bucket, COUNT(*) AS n
        FROM orders GROUP BY 1
    """,
    "b2_pivot": """
        SELECT o_orderstatus,
               CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
               CAST(count_if(o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
               CAST(count_if(o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
               CAST(count_if(o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "4-NOT SPECIFIED",
               CAST(count_if(o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
        FROM orders GROUP BY o_orderstatus
    """,
    "b2_in_subquery": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    """,
}
