"""Additional TPC-H-shaped analytic queries (Q10/Q12/Q15/Q18/Q19/Q21/Q22/
Q11/Q9/Q14/Q17 shapes, plus Q2/Q16/Q20 as q80b/q88b/q94b), adapted to the
driver's column subset (TESTDATA.md has no shipmode/commitdate/receiptdate/
phone/partsupp columns).

Widens the SURVEY.md §2B relational surface with the classic OLAP patterns
those queries exist to exercise: top-k over an aggregated join (Q10),
CASE-bucketed conditional counts over a fact-fact join (Q12), an aggregate
view filtered by its own MAX (Q15), HAVING-filtered aggregate re-joined to
dimensions (Q18), disjunctive multi-table predicates (Q19), correlated
EXISTS / NOT EXISTS as semi/anti self-joins (Q21), scalar-subquery
threshold + anti join (Q22), and group-share-of-total selection (Q11).

Scale notes (the shapes that matter at 100 TB):
- Fact-fact joins shuffle on the join key once; dimension sides are
  broadcast explicitly or pruned-then-AQE-planned.
- Q18/Q15/Q11 aggregate BEFORE joining — the HAVING/MAX/share filter runs
  on the small aggregated side, which is then broadcast; the raw fact table
  is never joined to itself.
- Q21 is deliberately the semi/anti self-join formulation (the operator
  under test); the per-order aggregate reformulation that avoids the
  self-join is noted in its docstring.
- All money sums use the exact-decimal pattern from functions/numeric.py so
  results hash-match the DuckDB oracle (no float sum nondeterminism).

Reference parity: the reference has no joins/aggregations at all (SURVEY.md
§2A "operators the reference does NOT have", read_encrypted_parquet.py:43
is its only query) — this module is expansion surface per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
from parquet_modular_encryption_spark.sources.datasets import load

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q102_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum(_REV)} AS revenue,
           c_acctbal,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk"),
)
def q102_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned items.
    Aggregated 4-table join ending in ORDER BY ... LIMIT, which Spark plans
    as TakeOrderedAndProject (per-partition top-k, no global sort). The
    LIMIT selection is deterministic: revenue is an exact decimal and
    c_custkey breaks ties. Scale: returnflag filter pushes to the lineitem
    scan (~1/3 selectivity); nation broadcast; customer pruned by AQE."""
    prep(spark)
    lineitem = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name", "c_acctbal").agg(
        dsum(F.expr(_REV)).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return agg.select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal", "n_lines").orderBy(
        F.col("revenue").desc(), F.col("c_custkey")
    ).limit(20)


@register(
    "q103_shipping_delay_buckets",
    oracle="""
    SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 0 THEN 'EARLY'
                WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 60 THEN 'ONTIME'
                ELSE 'LATE' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY delay_bucket
    """,
    tags=("join", "conditional-agg"),
)
def q103_shipping_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode replaced by a computed ship-delay bucket,
    the dataset has no l_shipmode): priority-class line counts per bucket —
    CASE-bucketed conditional aggregation over the orders⋈lineitem fact-fact
    join. Scale: single shuffle on orderkey; 3-group output; integer counts
    are exact in any engine."""
    prep(spark)
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(delay < 0, "EARLY").when(delay <= 60, "ONTIME").otherwise("LATE")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q104_large_volume_customers",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_date,
           o_totalprice,
           big.sum_qty
    FROM (
        SELECT l_orderkey, {sql_dsum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING {sql_dsum("l_quantity")} > 300
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    tags=("join", "having"),
)
def q104_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers holding orders of > 300 total units.
    Aggregate-then-join: the HAVING filter reduces lineitem to a tiny
    order-key set (46 rows at sf0.01, ~0.5% of orders at any SF) which is
    explicitly broadcast into orders — the fact table is never re-scanned
    against itself and orders never shuffles. Quantity sums use the exact
    decimal pattern so the HAVING boundary is engine-identical."""
    prep(spark)
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_date"),
            "o_totalprice",
            "sum_qty",
        )
    )


@register(
    "q105_disjunctive_filter_join",
    oracle=f"""
    SELECT {sql_dsum(_REV)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "disjunctive-predicate"),
)
def q105_disjunctive_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions predicate spanning both sides of
    a join. Catalyst extracts the common part-side disjuncts (brand/size)
    as a pushed filter on the broadcast part scan, evaluates the residual
    cross-table OR post-join — the pattern that shows predicate
    decomposition working. Single output row."""
    prep(spark)
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            dsum(F.expr(_REV)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q106_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
    tags=("join", "semi", "anti", "correlated"),
)
def q106_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per supplier, count finished-order lineitems where
    other suppliers participated in the order but none shipped later —
    correlated EXISTS / NOT EXISTS realized as left-semi and left-anti
    self-joins with a compound (equi + non-equi) condition. Scale: both
    self-joins share the orderkey shuffle partitioning of the main join, so
    AQE reuses one exchange of lineitem; at extreme SF the per-order
    aggregate reformulation (max shipdate of other suppliers via two-level
    agg) avoids the self-join entirely — kept as the semi/anti operator
    exercise here."""
    prep(spark)
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supplier = load(spark, sf_dir, "supplier")
    l1 = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = lineitem.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = lineitem.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waited = (
        l1.join(
            l2,
            (F.col("o2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o3") == F.col("l_orderkey"))
            & (F.col("s3") != F.col("l_suppkey"))
            & (F.col("d3") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waited.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q107_dormant_rich_customers",
    oracle=f"""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           {sql_dsum("c_acctbal")} AS total_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT {sql_davg("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    tags=("anti", "scalar-subquery"),
)
def q107_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone-prefix predicate replaced by nation grouping,
    'no orders' replaced by 'no orders since 2000' — every customer in the
    testdata has at least one order): customers with above-average positive
    balance and no recent orders. A scalar aggregate subquery gates the
    filter, then a left-anti join against the date-filtered orders removes
    active customers. The threshold uses the tie-free floor-average so the
    cut is engine-identical. Scale: the scalar is one tiny broadcast; the
    anti join shuffles on custkey (or broadcasts the pruned orders side via
    AQE when the date filter is selective)."""
    prep(spark)
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@register(
    "q108_top_revenue_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {sql_dsum(_REV)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON supplier_no = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("agg", "scalar-subquery", "view"),
)
def q108_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue — an
    aggregate view compared against its own MAX. Revenue is an exact
    decimal sum, so the equality against MAX is safe cross-engine (the
    classic Q15 float-equality trap disappears). Scale: the revenue view is
    |suppliers| rows; its MAX is a scalar broadcast; the shipdate range
    filter pushes to the parquet scan."""
    prep(spark)
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    q = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = q.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.expr(_REV)).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        supplier.join(revenue, F.col("supplier_no") == F.col("s_suppkey"))
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q109_important_parts",
    oracle=f"""
    SELECT l_partkey,
           {sql_dsum_floor(_REV, 100)} AS value_cents
    FROM lineitem
    GROUP BY l_partkey
    HAVING {sql_dsum_floor(_REV, 100)} * 10000 >
           6 * (SELECT {sql_dsum_floor(_REV, 100)} FROM lineitem)
    """,
    tags=("agg", "share-of-total", "scalar-subquery"),
)
def q109_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value replaced by lineitem revenue — the
    dataset has no partsupp table): parts whose revenue share exceeds
    6/10000 of the total. Share-of-total selection via a scalar aggregate
    subquery; both sides are exact bigint cents, compared by cross-
    multiplication so no division enters the predicate (bigint arithmetic
    is engine-identical; magnitudes stay < 2^63 beyond SF1000). Scale: one
    shuffle for the per-part aggregate; the grand total reuses the
    map-side partials and broadcasts one row."""
    prep(spark)
    lineitem = load(spark, sf_dir, "lineitem")
    rev = F.expr(_REV)
    per_part = lineitem.groupBy("l_partkey").agg(
        dsum_floor(rev, 100).alias("value_cents")
    )
    total = lineitem.agg(dsum_floor(rev, 100).alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 10000 > 6 * F.col("total_cents"))
        .select("l_partkey", "value_cents")
    )


@register(
    "q40_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           {sql_dsum(_REV)} AS profit,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    tags=("join", "tpch"),
)
def q40_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation × order year for parts
    matching a name pattern; the dataset has no partsupp, so profit is
    discounted revenue without supply cost). Scale: the name filter prunes
    part to a fraction and part/supplier/nation are all dimensions —
    broadcast every one of them; the only shuffle is orders⋈lineitem on
    orderkey. 25 nations × ~7 years keeps the agg output tiny."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            dsum(F.expr(_REV)).alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q83_promo_revenue",
    oracle=f"""
    SELECT {sql_dsum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_REV} ELSE 0 END")}
               AS promo_revenue,
           {sql_dsum(_REV)} AS total_revenue,
           100.0 * {sql_dsum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_REV} ELSE 0 END")}
               / {sql_dsum(_REV)} AS promo_pct
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    tags=("join", "conditional-agg", "tpch"),
)
def q83_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from promo parts.
    Both sums are exact decimals finalized to DOUBLE, and the percentage
    is one IEEE division of those two identical doubles — deterministic
    across engines. Scale: the month filter pushes into the lineitem scan
    (partition pruning on a date-partitioned layout); part is broadcast;
    zero additional shuffles beyond the final single-group agg."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    part = load(spark, sf_dir, "part")
    rev = F.expr(_REV)
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    agg = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            dsum(promo).alias("promo_revenue"),
            dsum(rev).alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


@register(
    "q94_small_qty_avg",
    oracle=f"""
    WITH thresh AS (
        SELECT l_partkey AS t_partkey,
               0.2 * (CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*)) AS qty_thresh
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part   ON p_partkey = l_partkey
    JOIN thresh ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#17'
      AND l_quantity < qty_thresh
    """,
    tags=("join", "correlated", "tpch"),
)
def q94_small_qty_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue that would be lost by dropping
    small-quantity orders (below 20% of the part's average quantity) for
    one brand. The correlated scalar subquery is decorrelated into a
    per-part pre-aggregate joined back on l_partkey — the shuffle for the
    agg and the shuffle for the join share the same key, so a cluster
    reuses the exchange. The threshold is deterministic cross-engine:
    quantities are integral doubles, so SUM is exact and 0.2*(sum/count)
    is the same IEEE expression both sides. Scale: the brand filter
    (broadcast part) prunes before the threshold join; per-part agg
    output is |part| rows, far smaller than lineitem."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#17")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count(F.lit(1)))).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(thresh, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q80b_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, s.s_acctbal,
           ps.cost AS supply_cost
    FROM part p
    JOIN supply ps ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE p.p_size <= 15
      AND ps.cost = (SELECT MIN(s2.cost) FROM supply s2
                     WHERE s2.l_partkey = p.p_partkey)
    """,
    tags=("join", "subquery", "argmin"),
)
def q80b_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp replaced by the observed per-(part,
    supplier) minimum sale price — the closest supply-cost analogue in
    TESTDATA.md's column subset): for every small part, the supplier(s)
    offering it at the part's minimum cost — a correlated scalar-MIN
    subquery referencing the outer part, the one canonical TPC-H
    subquery pattern the module did not yet register.

    The Spark side decorrelates the same way Catalyst rewrites Q2: a
    per-part MIN pre-aggregate joined back on (partkey, cost) — both
    shuffles share the l_partkey key, so a cluster reuses the exchange;
    ties (several suppliers at the minimum) are preserved, exactly as
    Q2's specification keeps them. MIN of raw doubles is exact (no
    arithmetic), so the equality join is deterministic cross-engine.
    Dimensions (filtered part, supplier) broadcast."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    supplier = load(spark, sf_dir, "supplier")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    best = supply.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    return (
        supply.join(best, "l_partkey")
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.col("cost").alias("supply_cost"),
        )
    )


@register(
    "q88b_part_supplier_census",
    oracle="""
    WITH blacklist AS (
        SELECT l_suppkey FROM lineitem GROUP BY l_suppkey
        HAVING SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 100
               > 34 * COUNT(*)
    )
    SELECT p_brand, p_size % 5 AS size_class,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (SELECT l_suppkey FROM blacklist)
    GROUP BY p_brand, p_size % 5
    """,
    tags=("join", "subquery", "census"),
)
def q88b_part_supplier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier census per part category,
    excluding suppliers matching a NOT IN subquery (Q16's "complaints"
    replaced by a high return-rate test). The exclusion predicate is
    integer-only cross-engine arithmetic — returns*100 > 34*total — so
    the blacklist membership is deterministic with no ratio rounding.

    Spark plans the NOT IN as a broadcast anti-join against the tiny
    aggregated blacklist (|suppliers| rows), then one shuffle for the
    COUNT(DISTINCT) census — the partial-distinct expansion keeps the
    map side combining. At 100 TB the blacklist aggregation is the
    standard two-phase count over the supplier key and stays bounded by
    supplier cardinality."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    returns = F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
    blacklist = (
        li.groupBy("l_suppkey")
        .agg(returns.alias("n_ret"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n_ret") * 100 > 34 * F.col("n"))
        .select("l_suppkey")
    )
    return (
        li.join(F.broadcast(blacklist), "l_suppkey", "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", (F.col("p_size") % 5).alias("size_class"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q94b_excess_share_suppliers",
    oracle="""
    WITH target AS (
        SELECT p_partkey FROM part WHERE p_size >= 40
    ), sq AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem JOIN target ON p_partkey = l_partkey
        GROUP BY l_partkey, l_suppkey
    ), pt AS (
        SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS total
        FROM sq GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_dominated_parts,
           CAST(SUM(sq.qty) AS BIGINT) AS dominated_qty
    FROM sq
    JOIN pt ON pt.l_partkey = sq.l_partkey
    JOIN supplier s ON s.s_suppkey = sq.l_suppkey
    WHERE 8 * sq.qty > pt.total
    GROUP BY s.s_suppkey, s.s_name
    """,
    tags=("join", "subquery", "share"),
)
def q94b_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty-vs-half-of-shipped replaced by
    share-of-part-volume in TESTDATA.md's columns): suppliers carrying
    an outsized share (> 1/8, strict) of any large part's total shipped
    quantity — the nested-subquery "excess concentration" selection,
    decorrelated into two chained aggregates over the same l_partkey
    shuffle key. Quantities are integral doubles cast to BIGINT before
    summing, and the share test is the integer cross-multiplication
    8*qty > total — zero floating point anywhere, so the selection is
    exact in both engines.

    Scale: the target-part filter (broadcast) prunes lineitem first;
    both aggregates and the share join key on l_partkey so the exchange
    is reused; the supplier dimension broadcasts onto the final
    bounded (supplier, part) survivors."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    target = (
        load(spark, sf_dir, "part").filter(F.col("p_size") >= 40).select("p_partkey")
    )
    supplier = load(spark, sf_dir, "supplier")
    sq = (
        li.join(F.broadcast(target), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    pt = sq.groupBy("l_partkey").agg(F.sum("qty").cast("bigint").alias("total"))
    return (
        sq.join(pt, "l_partkey")
        .filter(8 * F.col("qty") > F.col("total"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_dominated_parts"),
            F.sum("qty").cast("bigint").alias("dominated_qty"),
        )
    )
