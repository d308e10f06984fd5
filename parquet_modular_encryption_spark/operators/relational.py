"""Core relational operators, each registered as a named query + DuckDB oracle.

Covers the expansion surface of SURVEY.md §2B: scan/filter/project, equi- and
broadcast joins, semi/anti/outer joins, aggregation (sum/avg/min/max/count,
count-distinct, approx-distinct), HAVING, conditional aggregation, set ops,
scalar string/date/math/JSON functions, correlated subqueries, sort/limit.

Scale notes (local[32] tests, 1000-executor design):
- Filters/projections are plain Catalyst exprs → predicate pushdown and
  column pruning reach the parquet scan (verified in tests/test_plans.py).
- Dimension joins (region/nation/part/supplier) are broadcast explicitly;
  fact-fact joins (orders⋈lineitem) shuffle on the join key and benefit from
  AQE skew handling at scale.
- All double aggregations use the decimal-accumulation pattern from
  functions/numeric.py so results are bit-identical to the DuckDB oracle.

Reference parity: the reference's only query is a projected scan
(read_encrypted_parquet.py:43); q02_filter_project is its direct analogue,
the rest widen coverage per the driver's north star (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.text import hash60, sql_hash60

from parquet_modular_encryption_spark.functions.numeric import (
    davg,
    dsum,
    dsum_floor,
    sql_davg,
    sql_dsum,
    sql_dsum_floor,
)
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load, view

# ---------------------------------------------------------------------------
# Aggregation over a filtered fact scan (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: filter → groupBy → 8 aggregates → sort."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Projected + filtered scan (the reference's own query shape)
# ---------------------------------------------------------------------------


@register(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_quantity < 10
    """,
    tags=("scan", "filter", "project"),
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate pushdown — the reference's projected scan
    (read_encrypted_parquet.py:43) plus the predicate the format declares
    but never exercises (README.md:19)."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
            & (F.col("l_quantity") < 10)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topn"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join → agg → top-N (TPC-H Q3 shape). Customer side is filtered
    then joined; orders⋈lineitem is the fact-fact shuffle join."""
    prep(spark)
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q04_broadcast_brand_revenue",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           {sql_davg('l_quantity')} AS avg_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    tags=("join", "broadcast", "agg"),
)
def q04_broadcast_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dimension with an explicit broadcast: part is tiny relative to
    lineitem at every SF, so the join is shuffle-free on the fact side."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            davg("l_quantity").alias("avg_qty"),
        )
    )


@register(
    "q05_regional_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    GROUP BY r_name, n_name
    """,
    tags=("join", "broadcast", "agg"),
)
def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way snowflake join. region/nation broadcast (fixed cardinality);
    customer⋈orders⋈lineitem shuffle on their keys."""
    prep(spark)
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS promo_revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("scan", "filter", "agg"),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highly selective single-row aggregate (TPC-H Q6 shape): every
    predicate is pushdown-eligible, the agg is one map-side partial."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q07_group_having",
    oracle=f"""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           {sql_davg('c_acctbal')} AS avg_acctbal,
           MIN(c_acctbal) AS min_acctbal,
           MAX(c_acctbal) AS max_acctbal
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) >= 3
    """,
    tags=("agg", "having"),
)
def q07_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg("c_acctbal").alias("avg_acctbal"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
        )
        .filter(F.col("n_customers") >= 3)
    )


@register(
    "q08_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "distinct"),
)
def q08_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — expands to a two-phase aggregate in Spark;
    at 100 TB prefer q28_approx_distinct's HLL sketch when ±2% suffices."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@register(
    "q09_semi_join",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_active_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("join", "semi"),
)
def q09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers that placed at least one order."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
    )


@register(
    "q10_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_inactive_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("join", "anti"),
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive_customers"))
    )


@register(
    "q11_customer_order_histogram",
    oracle="""
    SELECT order_count, COUNT(*) AS n_customers
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS order_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY order_count
    """,
    tags=("join", "outer", "agg"),
)
def q11_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + two-level aggregation (TPC-H Q13 shape): customers
    with zero orders appear as order_count = 0."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(F.count(F.lit(1)).alias("n_customers"))


# ---------------------------------------------------------------------------
# Set operations / distinct
# ---------------------------------------------------------------------------


@register(
    "q12_set_ops",
    oracle="""
    (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
     INTERSECT
     SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000)
    UNION
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
     EXCEPT
     SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
    tags=("setops",),
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION with set (distinct) semantics."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    high_bal = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    big_spenders = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return high_bal.intersect(big_spenders).union(auto.subtract(high_bal)).distinct()


@register(
    "q13_distinct_pairs",
    oracle="SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
    tags=("distinct",),
)
def q13_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT on a projected key pair (exact deduplication primitive)."""
    prep(spark)
    return load(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus").distinct()


# ---------------------------------------------------------------------------
# Conditional aggregation / scalar function coverage
# ---------------------------------------------------------------------------


@register(
    "q14_conditional_agg",
    oracle=f"""
    SELECT l_linestatus,
           {sql_dsum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END")} AS returned_value,
           {sql_dsum("CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0 END")} AS kept_value,
           CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
           COUNT(*) AS n_total
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg", "case"),
)
def q14_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN inside aggregates (pivot-style conditional sums)."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    returned = F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(F.lit(0))
    kept = F.when(F.col("l_returnflag") != "R", F.col("l_extendedprice")).otherwise(F.lit(0))
    return li.groupBy("l_linestatus").agg(
        dsum(returned).alias("returned_value"),
        dsum(kept).alias("kept_value"),
        F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).alias("n_bulk"),
        F.count(F.lit(1)).alias("n_total"),
    )


@register(
    "q15_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(substring(p_name, 1, 12)) AS name_prefix,
           length(p_name) AS name_len,
           concat(p_brand, '/', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake
    FROM part
    WHERE p_name LIKE '%a%' AND p_size BETWEEN 5 AND 40
    """,
    tags=("scalar", "string"),
)
def q15_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string functions: substring/upper/length/concat/replace/LIKE."""
    prep(spark)
    part = load(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%a%") & F.col("p_size").between(5, 40))
        .select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 12)).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        )
    )


@register(
    "q16_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_95,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
    tags=("scalar", "datetime"),
)
def q16_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time functions: extract, datediff, date arithmetic."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    odate = F.col("o_orderdate").cast("date")
    return orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.datediff(odate, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_95"),
        F.date_add(odate, 30).alias("due_date"),
    )


@register(
    "q17_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000.0) AS abs_delta,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS price_bucket,
           sqrt(l_extendedprice) AS price_sqrt,
           CAST(l_partkey % 13 AS BIGINT) AS partkey_mod
    FROM lineitem
    WHERE l_linenumber = 1 AND l_quantity > 45
    """,
    tags=("scalar", "math"),
)
def q17_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math: abs/ceil/floor/sqrt/mod. sqrt is IEEE correctly-rounded,
    so it is safe for cross-engine hashing (ln/exp are not — excluded)."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_quantity") > 45)).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_delta"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_bucket"),
        F.floor(F.col("l_extendedprice") / 100.0).alias("price_bucket"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_partkey") % 13).alias("partkey_mod"),
    )


@register(
    "q18_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props string column."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q38b_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           CAST(COUNT(json_extract(props, '$.missing')) AS BIGINT) AS n_missing_hits
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json", "variant"),
)
def q38b_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured decode via Spark 4's VARIANT type: ``parse_json``
    converts the props string to the binary variant encoding ONCE, then
    ``variant_get`` performs typed path extraction and ``try_variant_get``
    null-safely probes an absent path — the modern replacement for q18's
    per-path ``get_json_object`` (which re-parses the JSON string for
    every extraction). At 100 TB the difference is material: variant
    decodes each value once into a traversable binary form, and Parquet
    variant shredding can push typed subfields down to the scan. Output
    matches q18's aggregate shape (plus the absent-path probe count), so
    the oracle stays plain JSON SQL — the VARIANT path must be a pure
    representation change, never a semantics change."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count(missing).alias("n_missing_hits"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / subqueries
# ---------------------------------------------------------------------------


@register(
    "q25_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("sort", "limit"),
)
def q25_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark executes as TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort at scale. Unique tiebreak key
    makes the result set deterministic."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q26_exists_subquery",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 45
      )
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "semi"),
)
def q26_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery (TPC-H Q4 shape) via Spark SQL — Catalyst
    decorrelates it into a left-semi join."""
    prep(spark)
    view(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_quantity > 45
          )
        GROUP BY o_orderpriority
        """
    )


@register(
    "q27_scalar_subquery",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_davg('c_acctbal')} AS avg_bal,
           COUNT(*) AS n_above_global_avg
    FROM customer
    WHERE c_acctbal > (SELECT {sql_davg('c_acctbal')} FROM customer)
    GROUP BY c_mktsegment
    """,
    tags=("subquery",),
)
def q27_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate."""
    prep(spark)
    view(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        SELECT c_mktsegment,
               {sql_davg('c_acctbal')} AS avg_bal,
               COUNT(*) AS n_above_global_avg
        FROM customer
        WHERE c_acctbal > (SELECT {sql_davg('c_acctbal')} FROM customer)
        GROUP BY c_mktsegment
        """
    )


@register(
    "q28_approx_distinct",
    oracle=None,  # HLL sketch is engine-specific; driver does a rows-only
    # check, tests/test_relational.py asserts ±5% vs exact.
    tags=("agg", "approx"),
)
def q28_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB-scale substitute for
    exact COUNT(DISTINCT) — one pass, fixed memory, no distinct shuffle."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q68_correlated_agg_subquery",
    oracle="""
    SELECT COUNT(*) AS n_small_orders,
           (CAST(CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) * 10000) AS BIGINT)
             AS DOUBLE) / 10000.0) AS total_value
    FROM lineitem l1
    WHERE l_quantity < 0.5 * (
        SELECT AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
    )
    """,
    tags=("subquery", "correlated", "agg"),
)
def q68_correlated_agg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery (TPC-H Q17 shape): rows below half
    their part's average quantity. Catalyst decorrelates into an aggregate
    + join — no per-row re-execution. Plain AVG is safe here only because
    l_quantity is integer-valued (integer-valued doubles sum exactly in
    any order); for fractional columns use the decimal pattern."""
    prep(spark)
    view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT COUNT(*) AS n_small_orders,
               (CAST(CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) * 10000) AS BIGINT)
                 AS DOUBLE) / 10000.0) AS total_value
        FROM lineitem l1
        WHERE l_quantity < 0.5 * (
            SELECT AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
        )
        """
    )


@register(
    "q71_array_agg",
    oracle="""
    SELECT c_nationkey,
           list_sort(list(c_mktsegment)) AS segments,
           list_sort(list(DISTINCT c_mktsegment)) AS distinct_segments,
           COUNT(*) AS n_customers
    FROM customer
    WHERE c_acctbal > 7000
    GROUP BY c_nationkey
    """,
    tags=("agg", "array"),
)
def q71_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_list/collect_set are order-nondeterministic
    in a distributed engine, so results are canonicalized with sort_array —
    the only way array-valued aggregates can be value-compared at all."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_acctbal") > 7000)
        .groupBy("c_nationkey")
        .agg(
            F.sort_array(F.collect_list("c_mktsegment")).alias("segments"),
            F.sort_array(F.collect_set("c_mktsegment")).alias("distinct_segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "q72_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("agg", "string"),
)
def q72_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG semantics) via the portable
    sort_array(collect_list) → concat_ws composition."""
    prep(spark)
    nation = load(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "q77_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "multiway"),
)
def q77_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two fact tables joined with two independent dimension
    chains through self-aliased nation. Scale design: nation is broadcast
    explicitly (25 rows at any SF); supplier/customer are left to AQE —
    after the 2-of-25-nations broadcast filter prunes them ~92%, AQE
    converts them to broadcast sides when they fit, and falls back to
    shuffle joins at SFs where a customer dimension is genuinely large.
    The orders⋈lineitem fact-fact join shuffles on orderkey regardless."""
    prep(spark)
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    supp = supplier.join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
    cust = customer.join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@register(
    "q78_market_share",
    oracle=f"""
    WITH sales AS (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               n2.n_name AS supp_nation,
               l_extendedprice * (1 - l_discount) AS rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE'
    )
    SELECT o_year,
           {sql_dsum_floor("CASE WHEN supp_nation = 'NATION_7' THEN rev ELSE 0.0 END", 100)}
               / {sql_dsum_floor('rev', 100)} AS mkt_share,
           {sql_dsum('rev')} AS total_revenue,
           COUNT(*) AS n_lineitems
    FROM sales
    GROUP BY o_year
    """,
    tags=("join", "multiway", "ratio"),
)
def q78_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's yearly revenue share inside a
    customer region — a 6-table join feeding a conditional-aggregate ratio.
    Determinism: numerator and denominator are exact decimal sums floored at
    2 decimals (tie-free), so the final double division is IEEE-identical in
    both engines. Scale: region/nation broadcast; customer/supplier pruned
    by the region filter then AQE-planned; single fact-fact shuffle."""
    prep(spark)
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    eur_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("cust_nk"))
    cust = customer.join(
        F.broadcast(eur_nations), F.col("c_nationkey") == F.col("cust_nk")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("supp_nk"),
    ).select("s_suppkey", "supp_nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sales = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.col("supp_nation"),
            rev.alias("rev"),
        )
    )
    national = F.when(F.col("supp_nation") == "NATION_7", F.col("rev")).otherwise(F.lit(0.0))
    return sales.groupBy("o_year").agg(
        (dsum_floor(national, 100) / dsum_floor(F.col("rev"), 100)).alias("mkt_share"),
        dsum(F.col("rev")).alias("total_revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# Unique bigint ordering key for arg_max/arg_min parity: 2-decimal acctbal
# scaled to an exact integer, custkey as tiebreaker (custkey < 1e10).
_ORD_SQL = "(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 10000000000 + c_custkey)"


@register(
    "q80_argmax_customer",
    oracle=f"""
    SELECT c_nationkey,
           arg_max(c_name, {_ORD_SQL}) AS richest_customer,
           arg_min(c_name, {_ORD_SQL}) AS poorest_customer,
           MAX(c_acctbal) AS max_acctbal,
           MIN(c_acctbal) AS min_acctbal,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("agg", "argmax"),
)
def q80_argmax_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY / MIN_BY (arg_max/arg_min) aggregates: the 'row attached to
    the extreme' without a self-join or window. Ties are broken by folding
    the 2-decimal balance and the unique custkey into one exact bigint
    ordering key — deterministic in any engine and any partitioning. One
    map-side-combinable aggregate; no window shuffle, unlike the q22
    top-k-per-group shape."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    ordkey = (
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint") * F.lit(10000000000).cast("bigint")
        + F.col("c_custkey")
    )
    return cust.groupBy("c_nationkey").agg(
        F.max_by("c_name", ordkey).alias("richest_customer"),
        F.min_by("c_name", ordkey).alias("poorest_customer"),
        F.max("c_acctbal").alias("max_acctbal"),
        F.min("c_acctbal").alias("min_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "q85_region_segment_grid",
    oracle=f"""
    WITH grid AS (
        SELECT r_name, seg
        FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
    ), actual AS (
        SELECT r_name AS a_region, c_mktsegment AS a_seg,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderstatus = 'F'
        GROUP BY a_region, a_seg
    )
    SELECT g.r_name AS region, g.seg AS segment,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(revenue, CAST(0 AS DOUBLE)) AS revenue,
           (n_orders IS NULL) AS is_empty_cell
    FROM grid g
    LEFT JOIN actual ON g.r_name = a_region AND g.seg = a_seg
    """,
    tags=("join", "cross", "nulls"),
)
def q85_region_segment_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense reporting grid: CROSS JOIN of two small dimensions, LEFT JOIN
    of the sparse fact aggregate, NULL-handling (COALESCE + IS NULL flag)
    for empty cells. The cross join is dimension×dimension (25 cells at any
    SF) — the one place a cartesian product is the right plan — and both
    grid sides broadcast; the fact aggregation happens BEFORE the join, so
    the outer join probes a tiny aggregate, never raw orders."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    segments = customer.select(F.col("c_mktsegment").alias("seg")).distinct()
    grid = region.select("r_name").crossJoin(segments)
    actual = (
        orders.filter(F.col("o_orderstatus") == "F")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("a_region"), F.col("c_mktsegment").alias("a_seg"))
        .agg(
            F.count(F.lit(1)).alias("n_orders_raw"),
            dsum("o_totalprice").alias("revenue_raw"),
        )
    )
    return (
        F.broadcast(grid)
        .join(
            actual,
            (F.col("r_name") == F.col("a_region")) & (F.col("seg") == F.col("a_seg")),
            "left",
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("seg").alias("segment"),
            F.coalesce("n_orders_raw", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue_raw", F.lit(0.0)).alias("revenue"),
            F.col("n_orders_raw").isNull().alias("is_empty_cell"),
        )
    )


@register(
    "q92b_set_ops_all",
    oracle="""
    WITH ia AS (
        SELECT l_orderkey FROM (
            SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
            INTERSECT ALL
            SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
        ) GROUP BY l_orderkey HAVING COUNT(*) >= 2
    ), ea AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_excess FROM (
            SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
            EXCEPT ALL
            SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
        ) GROUP BY l_orderkey
    )
    SELECT COALESCE(ia.l_orderkey, ea.l_orderkey) AS l_orderkey,
           ia.l_orderkey IS NOT NULL AS multi_overlap,
           COALESCE(ea.n_excess, 0) AS n_excess
    FROM ia FULL JOIN ea ON ia.l_orderkey = ea.l_orderkey
    """,
    tags=("setops", "bag"),
)
def q92b_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations — ``intersectAll`` / ``exceptAll``
    (multiset min / multiset difference), the ALL variants q12's
    distinct INTERSECT/EXCEPT do not exercise: per order key, the
    returned-lines multiset is intersected with and subtracted from the
    finished-lines multiset, keeping DUPLICATE cardinalities (an order
    with 3 returned + 2 finished lines contributes min=2 to the
    intersection and 3-2=1 to the difference — distinct semantics would
    collapse both to 0/1).

    Spark plans both as aggregate-then-expand (count per row value on
    each side, then replicate min/difference counts) — one shuffle per
    side on the row value, no join of the raw inputs. The output
    aggregates the multisets back to per-key cardinalities so the hash
    check pins the duplicate counts exactly."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_orderkey")
    ia = (
        a.intersectAll(b)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_int"))
        .filter(F.col("n_int") >= 2)
        .select("l_orderkey")
    )
    ea = a.exceptAll(b).groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_excess")
    )
    return (
        ia.withColumn("hit", F.lit(True))
        .join(ea, "l_orderkey", "full")
        .select(
            "l_orderkey",
            F.col("hit").isNotNull().alias("multi_overlap"),
            F.coalesce("n_excess", F.lit(0)).alias("n_excess"),
        )
    )


@register(
    "q92_union_by_name",
    oracle=f"""
    WITH unified AS (
        SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, '1996' AS src
        FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        UNION ALL BY NAME
        SELECT o_orderkey, o_orderpriority, o_totalprice, '1997' AS src
        FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
    )
    SELECT src,
           COUNT(*) AS n_orders,
           COUNT(o_orderpriority) AS n_with_priority,
           {sql_dsum('o_totalprice')} AS total_price
    FROM unified
    GROUP BY src
    """,
    tags=("setops", "union-by-name", "schema-evolution"),
)
def q92_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution-tolerant UNION: two extracts with different column
    sets and orders are aligned BY NAME (missing columns become NULL) —
    how heterogeneous historical partitions of an evolving table are
    unioned without positional bugs. The aggregate counts the NULL-filled
    column to prove alignment."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    y96 = (
        orders.filter(F.year("o_orderdate") == 1996)
        .select("o_orderkey", "o_totalprice", F.lit("1996").alias("src"))
    )
    y97 = (
        orders.filter(F.year("o_orderdate") == 1997)
        .select("o_orderkey", "o_orderpriority", "o_totalprice", F.lit("1997").alias("src"))
    )
    unified = y96.unionByName(y97, allowMissingColumns=True)
    return unified.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("o_orderpriority").alias("n_with_priority"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "q95_cdc_latest_wins",
    oracle=f"""
    WITH changes AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus, 0 AS version
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, 'U' AS o_orderstatus,
               1 AS version
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice * 1.2 AS o_totalprice, 'U' AS o_orderstatus,
               2 AS version
        FROM orders WHERE o_orderkey % 21 = 0
    ), resolved AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY version DESC) AS rn
        FROM changes
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(MAX(version) AS INT) AS max_version,
           {sql_dsum('o_totalprice')} AS total_price
    FROM resolved WHERE rn = 1
    GROUP BY o_orderstatus
    """,
    tags=("cdc", "merge", "dedup"),
)
def q95_cdc_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: base snapshot + two change batches resolved to
    latest-version-wins per key — the batch MERGE/upsert pattern (the batch
    twin of streaming read_upsert_dir). Scale: one window shuffle on the
    key; at 100 TB the change batches are tiny next to the snapshot, so AQE
    plans the union cheaply and the rank-filter prunes during the shuffle
    read. Versions are synthesized deterministically from orderkey so the
    oracle replays the identical change log."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_totalprice", "o_orderstatus", F.lit(0).alias("version")
    )
    upd1 = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
            F.lit(1).alias("version"),
        )
    )
    upd2 = (
        orders.filter(F.col("o_orderkey") % 21 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 1.2).alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
            F.lit(2).alias("version"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    resolved = (
        base.unionByName(upd1)
        .unionByName(upd2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return resolved.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("version").cast("int").alias("max_version"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "q101_data_quality_audit",
    oracle="""
    SELECT 'orphan_lineitems' AS check_name,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
               AS n_violations
    UNION ALL
    SELECT 'orders_without_customer',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'negative_quantity',
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'discount_out_of_range',
           (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
    UNION ALL
    SELECT 'null_ship_date',
           (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL)
    UNION ALL
    SELECT 'duplicate_order_lines',
           (SELECT COUNT(*) FROM (
               SELECT l_orderkey, l_linenumber FROM lineitem
               GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
    """,
    tags=("quality", "audit", "anti-join"),
)
def q101_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit suite: referential integrity (anti joins), range
    checks, null checks, and key-uniqueness — the validation pass that gates
    a 100 TB ingest before it reaches training. Each check is one
    aggregate; the union of scalar results is the audit report. Scale: the
    two anti joins shuffle on their keys (AQE-broadcast when the parent
    side is small); every other check is a map-side count."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")

    def one(name: str, df_count) -> DataFrame:
        return df_count.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("bigint").alias("n_violations"),
        )

    orphans = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    )
    no_cust = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("n"))
    neg_qty = li.agg(F.count_if(F.col("l_quantity") <= 0).alias("n"))
    bad_disc = li.agg(
        F.count_if((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("n")
    )
    null_ship = li.agg(F.count_if(F.col("l_shipdate").isNull()).alias("n"))
    dup_lines = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        one("orphan_lineitems", orphans)
        .unionByName(one("orders_without_customer", no_cust))
        .unionByName(one("negative_quantity", neg_qty))
        .unionByName(one("discount_out_of_range", bad_disc))
        .unionByName(one("null_ship_date", null_ship))
        .unionByName(one("duplicate_order_lines", dup_lines))
    )


# ---------------------------------------------------------------------------
# Corpus drift report (q88e)
# ---------------------------------------------------------------------------
DRIFT_SPLIT_DATE = "1998-06-01"  # epoch A = orders before, epoch B = after
DRIFT_PPM = 1_000_000


@register(
    "q88e_drift_report",
    oracle=f"""
    WITH tagged AS (
        SELECT o_orderpriority AS bucket,
               CASE WHEN o_orderdate < DATE '{DRIFT_SPLIT_DATE}' THEN 1 ELSE 0 END
                   AS in_a
        FROM orders
    ), per_bucket AS (
        SELECT bucket,
               CAST(SUM(in_a) AS BIGINT) AS cnt_a,
               CAST(SUM(1 - in_a) AS BIGINT) AS cnt_b
        FROM tagged GROUP BY bucket
    ), tot AS (
        SELECT SUM(cnt_a) AS n_a, SUM(cnt_b) AS n_b FROM per_bucket
    )
    SELECT bucket, cnt_a, cnt_b,
           CAST((cnt_a * {DRIFT_PPM}) // n_a AS BIGINT) AS share_a_ppm,
           CAST((cnt_b * {DRIFT_PPM}) // n_b AS BIGINT) AS share_b_ppm,
           CAST((abs(cnt_a * n_b - cnt_b * n_a) * {DRIFT_PPM}) // (n_a * n_b)
                AS BIGINT) AS shift_ppm
    FROM per_bucket CROSS JOIN tot
    """,
    tags=("audit", "drift", "diagnostics"),
)
def q88e_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between two data epochs — the check a
    training-data pipeline runs when a new crawl/dump lands: order
    priority shares in the epoch before vs after {DRIFT_SPLIT_DATE},
    with the per-bucket share shift |p_a - p_b| in exact ppm via
    cross-multiplied integers (|cnt_a*n_b - cnt_b*n_a| / (n_a*n_b) — no
    float ratios, so the report is hash-checked; summing shift_ppm/2
    gives total-variation distance). The classic PSI adds a log-ratio
    weight — rank-equivalent for flagging, but ln() is not portably
    rounded cross-engine, so the TV form is the exact one.

    Scale: one conditional-count pass over the fact table (map-side
    combined, epoch tag is a projection, never a join), buckets-sized
    result, scalar totals broadcast."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    in_a = (F.col("o_orderdate") < F.lit(DRIFT_SPLIT_DATE).cast("timestamp")).cast(
        "long"
    )
    per_bucket = (
        orders.select(F.col("o_orderpriority").alias("bucket"), in_a.alias("in_a"))
        .groupBy("bucket")
        .agg(
            F.sum("in_a").alias("cnt_a"),
            F.sum(F.lit(1) - F.col("in_a")).alias("cnt_b"),
        )
    )
    tot = per_bucket.agg(
        F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b")
    )
    return per_bucket.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "cnt_a",
        "cnt_b",
        F.expr(f"(cnt_a * {DRIFT_PPM}) DIV n_a").alias("share_a_ppm"),
        F.expr(f"(cnt_b * {DRIFT_PPM}) DIV n_b").alias("share_b_ppm"),
        F.expr(
            f"(abs(cnt_a * n_b - cnt_b * n_a) * {DRIFT_PPM}) DIV (n_a * n_b)"
        ).alias("shift_ppm"),
    )


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog (q88f): the oracle-checkable twin of q28
# ---------------------------------------------------------------------------
# q28 uses Spark's approx_count_distinct, whose HLL++ register layout is
# engine-internal — the driver can only rows-check it. This sketch is the
# same algorithm (Flajolet et al. 2007) built on the portable md5-based
# hash60 both engines compute bit-identically, so the ENTIRE sketch state
# — register census, exact BIGINT harmonic ladder, fixed-point estimate,
# ppm error vs exact — hash-checks against DuckDB, the same move q88c
# made for count-min. p=10 ⇒ m=1024 registers (≈3.25% standard error);
# hash60 yields 60 bits ⇒ 50 w-bits, so rho ∈ [1, 51].
HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
HLL_WBITS = 60 - HLL_P  # rank bits left after the bucket index
HLL_RMAX = HLL_WBITS + 1  # rho when all w-bits are zero
HLL_POW = 1 << HLL_RMAX  # 2^51: the harmonic ladder scale
# Harmonic sum S = sum(2^(RMAX - reg)) over all m registers (empty ⇒ reg 0
# ⇒ term 2^51). Max S = m * 2^51 = 2^61 < 2^63 — exact BIGINT, no floats.
# Raw HLL estimate alpha_m * m^2 / Z with Z = S / 2^51, alpha fixed at the
# asymptotic 0.7213: est = (0.7213 * m^2) * (2^51 / S). Both factors and
# the quotient are single IEEE-754 double ops on identical inputs —
# exactly rounded, engine-independent — and FLOOR (not ROUND: half-even
# vs half-up tie rules differ across engines) makes the BIGINT exact.
_HLL_EST_SQL = (
    f"CAST(FLOOR((0.7213 * {HLL_M * HLL_M}.0) * ({HLL_POW}.0 / CAST({{S}} AS DOUBLE)))"
    " AS BIGINT)"
)


def bitlen_sql(v: str, bits: int) -> str:
    """Portable integer bit-length of a non-negative BIGINT expression
    below 2^bits, as a generated comparison ladder (0 for v = 0). The
    one ladder generator serves both sketch twins (HLL rho, DDSketch
    octaves): no cross-engine log2/bit-length builtin exists (DuckDB
    lacks conv(), Spark lacks printf '%b') and float log2 risks boundary
    rounding exactly at the powers of two the buckets hinge on. The
    ladder is a single whole-stage-codegen'd expression."""
    branches = " ".join(
        f"WHEN {v} >= {1 << (bits - 1 - i)} THEN {bits - i}" for i in range(bits)
    )
    return f"CASE {branches} ELSE 0 END"


def hll_rho_sql(w: str) -> str:
    """rho(w) = leading zeros of the 50-bit value + 1, i.e.
    HLL_RMAX - bitlen(w) — derived from the shared comparison ladder so
    the two sketch twins cannot drift on boundary semantics."""
    return f"({HLL_RMAX} - ({bitlen_sql(w, HLL_WBITS)}))"


def hll_registers(df: DataFrame, group: str, key: Column) -> DataFrame:
    """(group, bucket, reg) register frame for a deterministic HLL over
    ``key`` — max(rho) per bucket. Duplicates hash identically, so the max
    is duplicate-insensitive by construction; registers from disjoint
    splits merge by MAX (pinned in tests/test_properties.py)."""
    h = hash60(key)
    return (
        df.select(F.col(group), h.alias("h"))
        .select(
            group,
            (F.col("h") % HLL_M).alias("bucket"),
            F.expr(hll_rho_sql(f"(h div {HLL_M})")).alias("rho"),
        )
        .groupBy(group, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


@register(
    "q88f_hll_deterministic",
    oracle=f"""
    WITH h AS (
        SELECT l_returnflag,
               {sql_hash60("'pk:' || CAST(l_partkey AS VARCHAR)")} AS h
        FROM lineitem
    ), b AS (
        SELECT l_returnflag, h % {HLL_M} AS bucket,
               {hll_rho_sql(f"(h // {HLL_M})")} AS rho
        FROM h
    ), regs AS (
        SELECT l_returnflag, bucket, MAX(rho) AS reg FROM b GROUP BY 1, 2
    ), sk AS (
        SELECT l_returnflag, COUNT(*) AS n_used,
               SUM(CAST(power(2.0, {HLL_RMAX} - reg) AS BIGINT)) AS s_used
        FROM regs GROUP BY 1
    ), ex AS (
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
        FROM lineitem GROUP BY 1
    ), j AS (
        SELECT sk.l_returnflag, ex.exact_distinct,
               CAST(sk.s_used + ({HLL_M} - sk.n_used) * {HLL_POW} AS BIGINT)
                   AS hll_harmonic_fp,
               {HLL_M} - sk.n_used AS zero_registers
        FROM sk JOIN ex USING (l_returnflag)
    ), e AS (
        SELECT *, {_HLL_EST_SQL.format(S="hll_harmonic_fp")} AS hll_est FROM j
    )
    SELECT l_returnflag, exact_distinct, hll_harmonic_fp, zero_registers,
           hll_est,
           (abs(hll_est - exact_distinct) * 1000000) // exact_distinct AS err_ppm
    FROM e
    """,
    tags=("agg", "approx", "sketch", "hll", "diagnostics"),
)
def q88f_hll_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-count sketch, FULLY hash-checked
    — per l_returnflag, the register census, exact-BIGINT harmonic ladder,
    fixed-point raw estimate, and its ppm error against the exact
    COUNT(DISTINCT) computed in the same query (the audit shape of q47c:
    the sketch ships with its own error report).

    Why this exists next to q28: approx_count_distinct's HLL++ registers
    are engine-internal, so the driver can only rows-check it. Owning the
    hash (md5-based hash60) makes the SAME algorithm reproducible in any
    engine — the estimator itself becomes oracle-checkable, leaving q28
    rows-only by engine choice, not by algorithmic necessity.

    Exactness: rho comes from an integer CASE ladder (hll_rho_sql); the
    harmonic sum is S = sum 2^(51-reg) <= 2^61 in BIGINT (power(2.0, k) is
    an exactly-representable integer double for k <= 51, so DuckDB's
    round-on-cast and Spark's truncate-on-cast agree); the estimate
    (0.7213*m^2)*(2^51/S) is two exactly-rounded double ops on identical
    inputs, floored (not rounded: cross-engine tie rules differ). The
    small-range linear-counting correction m*ln(m/V) is deliberately NOT
    applied in-query — libm ln() is not portably rounded; zero_registers V
    ships in the output so a consumer (or the pytest tolerance check) can
    apply it outside the hash-checked core.

    Scale: one projection pass over the fact table into (group, bucket)
    partial maxes — map-side combinable, fixed m=1024 registers per group
    regardless of input size, the one-pass bounded-memory shape that
    replaces the exact distinct shuffle at 100 TB. Registers from disjoint
    splits merge by MAX (mergeability pinned in test_properties), so the
    sketch composes across partitions, epochs, and streaming micro-batches
    exactly like q88c's CMS cells. The 3-row exact branch exists to price
    the sketch's error in the output; production ships registers only."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    regs = hll_registers(
        li,
        "l_returnflag",
        F.concat(F.lit("pk:"), F.col("l_partkey").cast("string")),
    )
    sk = regs.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(
            F.expr(f"CAST(power(2.0, {HLL_RMAX} - reg) AS BIGINT)")
        ).alias("s_used"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    j = sk.join(F.broadcast(exact), "l_returnflag").select(
        "l_returnflag",
        "exact_distinct",
        (
            F.col("s_used") + (F.lit(HLL_M) - F.col("n_used")) * F.lit(HLL_POW)
        ).alias("hll_harmonic_fp"),
        (F.lit(HLL_M) - F.col("n_used")).alias("zero_registers"),
    )
    return j.select(
        "*", F.expr(_HLL_EST_SQL.format(S="hll_harmonic_fp")).alias("hll_est")
    ).select(
        "*",
        F.expr(
            "(abs(hll_est - exact_distinct) * 1000000) DIV exact_distinct"
        ).alias("err_ppm"),
    )


# ---------------------------------------------------------------------------
# Deterministic log-linear quantile sketch (q88g): the oracle-checkable
# twin of q87 — completing the sketch trilogy (q88c CMS frequencies,
# q88f HLL distincts, q88g quantiles)
# ---------------------------------------------------------------------------
# DDSketch (Masson, Rim & Lee, VLDB'19) with the log-linear bucket map
# made INTEGER-ONLY so it is portably exact: instead of ceil(log_gamma(x))
# — whose libm log is not identically rounded across engines at bucket
# boundaries — values bucket by (bit-length, next-4-bits) = a base-2^(1/16)
# logarithm computed entirely from integer comparisons and divisions.
# Relative-error guarantee: a bucket [L, U) has U/L <= 17/16, so the
# reported lower edge is within 1/17 (~5.9%, 58824 ppm) of any value in
# the bucket; values < 16 cents get exact singleton buckets.
DDS_EXACT = 16  # values below this bucket exactly (one bucket per value)
DDS_SUB = 16  # subdivisions per octave: gamma = 2^(1/16)
DDS_BITS = 40  # bit-length ladder width (cents up to 2^40 ~ $10B)
DDS_QS = (25, 50, 75, 95)  # percentiles reported


def _dds_bucket_rep_sql(v: str, bl: str, divop: str) -> tuple[str, str]:
    """(bucket, rep) SQL for the log-linear map. For v >= 16: octave
    k = bl-1, sub-bucket m = (v div 2^(k-4)) - 16 in [0,16), bucket id
    16k+m (>= 64, disjoint from the exact region), representative = the
    bucket's lower edge (16+m)*2^(k-4). power(2.0, j) is an exactly-
    representable integer double for j <= 36, so the BIGINT cast is exact
    under both DuckDB round-on-cast and Spark truncate-on-cast."""
    pw = f"CAST(power(2.0, {bl} - 5) AS BIGINT)"
    m = f"(({v} {divop} {pw}) - {DDS_SUB})"
    bucket = (
        f"CASE WHEN {v} < {DDS_EXACT} THEN {v} "
        f"ELSE {DDS_SUB} * ({bl} - 1) + {m} END"
    )
    rep = (
        f"CASE WHEN {v} < {DDS_EXACT} THEN {v} "
        f"ELSE ({DDS_SUB} + {m}) * {pw} END"
    )
    return bucket, rep


_DDS_CENTS = "CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)"


def _dds_oracle() -> str:
    bl = bitlen_sql("v", DDS_BITS)
    bucket, rep = _dds_bucket_rep_sql("v", "bl", "//")
    qvals = ", ".join(f"({q})" for q in DDS_QS)
    return f"""
    WITH vals AS (
        SELECT l_returnflag, {_DDS_CENTS} AS v FROM lineitem
    ), blv AS (
        SELECT l_returnflag, v, {bl} AS bl FROM vals
    ), bucketed AS (
        SELECT l_returnflag, {bucket} AS bucket, {rep} AS rep FROM blv
    ), buckets AS (
        SELECT l_returnflag, bucket, rep, COUNT(*) AS c
        FROM bucketed GROUP BY 1, 2, 3
    ), bcum AS (
        SELECT l_returnflag, rep,
               SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               SUM(c) OVER (PARTITION BY l_returnflag) AS tot
        FROM buckets
    ), qs(q_pct) AS (VALUES {qvals}),
    sketch AS (
        SELECT l_returnflag, q_pct,
               MIN(CASE WHEN 100 * cum >= q_pct * tot THEN rep END)
                   AS sketch_cents,
               CAST(MIN(tot) AS BIGINT) AS n_rows
        FROM bcum CROSS JOIN qs GROUP BY 1, 2
    ), vcounts AS (
        SELECT l_returnflag, v, COUNT(*) AS c FROM vals GROUP BY 1, 2
    ), vcum AS (
        SELECT l_returnflag, v,
               SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               SUM(c) OVER (PARTITION BY l_returnflag) AS tot
        FROM vcounts
    ), exact AS (
        SELECT l_returnflag, q_pct,
               MIN(CASE WHEN 100 * cum >= q_pct * tot THEN v END)
                   AS exact_cents
        FROM vcum CROSS JOIN qs GROUP BY 1, 2
    )
    SELECT s.l_returnflag, s.q_pct, s.n_rows, s.sketch_cents, e.exact_cents,
           (abs(s.sketch_cents - e.exact_cents) * 1000000) // e.exact_cents
               AS err_ppm
    FROM sketch s JOIN exact e
      ON s.l_returnflag = e.l_returnflag AND s.q_pct = e.q_pct
    """


def dds_buckets(df: DataFrame, group: str, cents: Column) -> DataFrame:
    """(group, bucket, rep, c) log-linear bucket-count frame — the sketch
    state. Bucket counts SUM-merge across disjoint splits (pinned in
    tests/test_properties.py), so the sketch composes across partitions,
    epochs, and streaming micro-batches like q88c's CMS cells and q88f's
    HLL registers."""
    bl = bitlen_sql("v", DDS_BITS)
    bucket, rep = _dds_bucket_rep_sql("v", "bl", "DIV")
    return (
        df.select(F.col(group), cents.alias("v"))
        .select(group, "v", F.expr(bl).alias("bl"))
        .select(group, F.expr(bucket).alias("bucket"), F.expr(rep).alias("rep"))
        .groupBy(group, "bucket", "rep")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@register(
    "q88g_ddsketch_quantiles",
    oracle=_dds_oracle(),
    tags=("agg", "approx", "sketch", "quantile", "diagnostics"),
)
def q88g_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic relative-error quantile sketch (DDSketch's log-linear
    bucket map, integer-only), FULLY hash-checked — per l_returnflag, the
    p25/p50/p75/p95 of extended price in cents from the sketch next to the
    exact rank-crossing answer and the ppm error, all BIGINT.

    Completes the deterministic-sketch trilogy (q88c CMS, q88f HLL): q87's
    Greenwald-Khanna summary is Spark-internal, so the driver can only
    rows-check it — but the QUANTILE-SKETCH class itself is oracle-
    checkable once the bucket map is portable. Buckets come from integer
    comparisons alone (bitlen_sql ladder + next-4-bits sub-bucket =
    a base-2^(1/16) log with no libm), giving the DDSketch guarantee:
    reported value within 1/17 (~5.9%) of the true discrete quantile,
    exact below 16 cents. The crossing test 100*cum >= q*tot is cross-
    multiplied BIGINT — no rank division anywhere.

    Scale: the sketch state is <= ~700 buckets per group REGARDLESS of
    input size (one map-side-combinable pass), so the per-group window
    that orders buckets sorts a bounded frame — this is precisely what
    q66b's exact median cannot do (it sorts all n rows per group) and why
    a 100 TB pipeline ships bucket counts, SUM-merged across partitions
    and micro-batches, then extracts quantiles driver-side from hundreds
    of rows. The exact branch here prices the sketch's error in the
    output (the q47c/q88f audit shape); production omits it."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    qspec = F.explode(F.array(*[F.lit(q) for q in DDS_QS])).alias("q_pct")

    buckets = dds_buckets(li, "l_returnflag", F.expr(_DDS_CENTS))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    bcum = buckets.select(
        "l_returnflag",
        "rep",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wtot).alias("tot"),
    )
    sketch = (
        bcum.select("*", qspec)
        .groupBy("l_returnflag", "q_pct")
        .agg(
            F.min(
                F.when(100 * F.col("cum") >= F.col("q_pct") * F.col("tot"), F.col("rep"))
            ).alias("sketch_cents"),
            F.min("tot").cast("bigint").alias("n_rows"),
        )
    )

    vcounts = (
        li.select("l_returnflag", F.expr(_DDS_CENTS).alias("v"))
        .groupBy("l_returnflag", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vw = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vcum = vcounts.select(
        "l_returnflag",
        "v",
        F.sum("c").over(vw).alias("cum"),
        F.sum("c").over(wtot).alias("tot"),
    )
    exact = (
        vcum.select("*", qspec)
        .groupBy("l_returnflag", "q_pct")
        .agg(
            F.min(
                F.when(100 * F.col("cum") >= F.col("q_pct") * F.col("tot"), F.col("v"))
            ).alias("exact_cents")
        )
    )
    return sketch.join(F.broadcast(exact), ["l_returnflag", "q_pct"]).select(
        "l_returnflag",
        "q_pct",
        "n_rows",
        "sketch_cents",
        "exact_cents",
        F.expr(
            "(abs(sketch_cents - exact_cents) * 1000000) DIV exact_cents"
        ).alias("err_ppm"),
    )
