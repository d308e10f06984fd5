"""Window functions: ranking, running aggregates, lag/lead, per-group top-k.

Scale notes: a window over ``partitionBy(k)`` shuffles once on k and sorts
within partitions — the same shuffle an aggregation on k would need. Skewed
partition keys (one giant customer) are the 100 TB hazard; AQE cannot split
a window partition, so the key choice (custkey, user_id, nation) matters.
Running double sums use the decimal trick (DuckDB evaluates windowed SUM
with a segment tree — different addition order than Spark's incremental
frame evaluation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.numeric import dsum, dsum_window
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load


@register(
    "q19_window_rank",
    oracle="""
    SELECT * FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               CAST(rank()       OVER w AS INT) AS bal_rank,
               CAST(row_number() OVER w AS INT) AS bal_row,
               CAST(dense_rank() OVER w AS INT) AS bal_dense
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ) WHERE bal_rank <= 3
    """,
    tags=("window", "rank"),
)
def q19_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/row_number/dense_rank per nation with a deterministic tiebreak."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).cast("int").alias("bal_rank"),
            F.row_number().over(w).cast("int").alias("bal_row"),
            F.dense_rank().over(w).cast("int").alias("bal_dense"),
        )
        .filter(F.col("bal_rank") <= 3)
    )


@register(
    "q20_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
    FROM orders
    """,
    tags=("window", "running"),
)
def q20_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) spend per customer over order history."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        dsum_window("o_totalprice", w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "running_spend"
        ),
        F.row_number().over(w).cast("int").alias("order_seq"),
    )


@register(
    "q21_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           epoch_us(ts) AS ts_us,
           epoch_us(lag(ts)  OVER w) AS prev_ts_us,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
           lead(event_type) OVER w AS next_event_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "lag"),
)
def q21_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event streams; time deltas in exact integer
    microseconds (portable across Spark µs and DuckDB ns timestamps)."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    prev_us = F.unix_micros(F.lag("ts").over(w))
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        ts_us.alias("ts_us"),
        prev_us.alias("prev_ts_us"),
        (ts_us - prev_us).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@register(
    "q22_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY c_mktsegment
                                       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 5
    """,
    tags=("window", "topk", "join"),
)
def q22_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k rows per group via row_number — the distributed top-k idiom
    (filter immediately after rank so only k rows per group survive)."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 5)
    )


@register(
    "q69_range_frame",
    oracle=f"""
    SELECT o_custkey, o_orderkey, day_key,
           COUNT(*) OVER w AS n_orders_90d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER w AS DOUBLE)
               AS spend_90d
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                   AS day_key
        FROM orders
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY day_key
                 RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range-frame"),
)
def q69_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): trailing-90-day
    order count and spend per customer. Unlike ROWS frames, ties on the
    order key share a frame, so no tiebreak column is needed — the frame
    is a deterministic function of the key value."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    with_day = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date"))
        .cast("bigint")
        .alias("day_key"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_key")
        .rangeBetween(-90, Window.currentRow)
    )
    return with_day.select(
        "o_custkey",
        "o_orderkey",
        "day_key",
        F.count(F.lit(1)).over(w).alias("n_orders_90d"),
        F.sum(F.col("o_totalprice").cast("decimal(38,4)")).over(w).cast("double").alias(
            "spend_90d"
        ),
    )


@register(
    "q70_window_navigation",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           first_value(c_custkey) OVER w AS richest_custkey,
           nth_value(c_custkey, 2) OVER w AS second_custkey,
           CAST(ntile(4) OVER w AS INT) AS wealth_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "navigation"),
)
def q70_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation functions: first_value / nth_value over the full
    partition frame, plus ntile bucketing — deterministic under the unique
    (balance, custkey) total order."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return cust.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.first("c_custkey").over(w).alias("richest_custkey"),
        F.nth_value("c_custkey", 2).over(w).alias("second_custkey"),
        F.ntile(4).over(
            Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        ).cast("int").alias("wealth_quartile"),
    )


@register(
    "q79_decile_stats",
    oracle="""
    SELECT decile,
           COUNT(*) AS n_customers,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           (CAST(CAST(floor(SUM(CAST(c_acctbal AS DECIMAL(38,10))) * 10000) AS BIGINT)
             AS DOUBLE) / 10000.0) AS total_bal
    FROM (
        SELECT c_acctbal,
               CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS decile
        FROM customer
    )
    GROUP BY decile
    """,
    tags=("window", "ntile"),
)
def q79_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile bucketing → per-decile stats. The unpartitioned global
    ORDER BY is the worst case for a window at scale (single-task sort);
    the production path for a global ntile over 100 TB is approx quantile
    cut-points + a stateless bucket projection — q79 keeps the exact NTILE
    semantics as the correctness anchor, with c_custkey as tiebreaker so
    the bucket assignment is total-order deterministic."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_acctbal", F.ntile(10).over(w).cast("int").alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@register(
    "q93_last_value_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_good_value,
           (event_type = 'error') AS is_error
    FROM events
    """,
    tags=("window", "ignore-nulls"),
)
def q93_last_value_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill via IGNORE NULLS: every event carries the most recent
    non-error value for its user (gap-filling / last-observation-carried-
    forward — the standard telemetry repair). One window shuffle on
    user_id; the running frame is evaluated incrementally, not re-scanned
    per row."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    good = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(good, ignorenulls=True).over(w).alias("last_good_value"),
        (F.col("event_type") == "error").alias("is_error"),
    )
