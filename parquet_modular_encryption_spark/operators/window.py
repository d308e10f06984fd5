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

from parquet_modular_encryption_spark.functions.numeric import (
    davg,
    dsum,
    dsum_window,
    sql_davg,
)
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


V_SQL = sql_davg("value")


@register(
    "q93b_resample_interpolate",
    oracle=f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hr,
               {V_SQL} AS v
        FROM events WHERE user_id < 40
        GROUP BY 1, 2
    ), bounds AS (
        SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi FROM hourly GROUP BY 1
    ), spine AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        FROM bounds
    ), joined AS (
        SELECT s.user_id, s.hr, h.v FROM spine s
        LEFT JOIN hourly h ON h.user_id = s.user_id AND h.hr = s.hr
    ), walled AS (
        SELECT user_id, hr, v,
               last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
               last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
                   OVER w_prev AS prev_hr,
               first_value(v IGNORE NULLS) OVER w_next AS next_v,
               first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
                   OVER w_next AS next_hr
        FROM joined
        WINDOW w_prev AS (PARTITION BY user_id ORDER BY hr
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY user_id ORDER BY hr
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, hr,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v)
                     * ((CAST(epoch(hr) AS BIGINT) - CAST(epoch(prev_hr) AS BIGINT))
                        / (CAST(epoch(next_hr) AS BIGINT) - CAST(epoch(prev_hr) AS BIGINT)))
           END AS value_filled,
           (v IS NULL) AS was_gap
    FROM walled
    """,
    tags=("window", "timeseries", "interpolation"),
)
def q93b_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + linear interpolation: per-user hourly grid
    (sequence spine between each user's first and last active hour), left
    join of the hourly averages, and gap hours linearly interpolated
    between the bracketing observations (boundary gaps take the nearest
    observation). The interpolation fraction uses integer epoch seconds
    and identical IEEE expression order on both engines, and the hourly
    average is the exact-decimal floor form — so every filled double
    hash-matches the oracle.

    Scale: spine cardinality is sum over users of their active-hour span
    — linear in users, never events²; all three windows and the join
    shuffle on user_id, so one exchange feeds them all. The user_id < 40
    filter bounds the demo output; the operator itself has no such
    limit."""
    prep(spark)
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(davg("value").alias("v"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr"),
    )
    joined = spine.join(hourly, ["user_id", "hr"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("v").isNotNull(), F.col("hr"))
    walled = joined.select(
        "user_id",
        "hr",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_hr, ignorenulls=True).over(w_prev).alias("prev_hr"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_hr, ignorenulls=True).over(w_next).alias("next_hr"),
    )
    frac = (
        (F.unix_timestamp("hr") - F.unix_timestamp("prev_hr")).cast("double")
        / (F.unix_timestamp("next_hr") - F.unix_timestamp("prev_hr")).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac
        )
    )
    return walled.select(
        "user_id",
        "hr",
        filled.alias("value_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


# ---------------------------------------------------------------------------
# Global ordinals without a global window
# ---------------------------------------------------------------------------

#: range-partition fan-out for the two-phase ordinal assignment. At 100 TB
#: this is the cluster's reducer count; the driver-side offset table stays
#: one tiny row per partition regardless of data size.
_ORDINAL_PARTS = 16


def global_ordinals(df: DataFrame, sort_cols: list[str]) -> DataFrame:
    """Assign 1-based global ordinals by ``sort_cols`` (must be a unique
    composite key) WITHOUT a single-reducer global window.

    ``ROW_NUMBER() OVER (ORDER BY ...)`` — the oracle formulation — sorts
    the whole table on ONE reducer; it is the canonical operation that
    works at sf0.1 and dies at 100 TB. The scalable shape is two phases:

    1. ``repartitionByRange`` on the sort key: partition i holds keys
       strictly below partition i+1 (Spark's RangePartitioner contract),
       each sorted locally in parallel.
    2. Per-partition row counts (one tiny aggregate, collected — bounded
       by the partition count, not the data) become cumulative offsets;
       ordinal = offset[pid] + local rank, where the local rank is a
       window partitioned BY pid — embarrassingly parallel.

    The frame is localCheckpointed after range partitioning so the count
    pass and the rank pass see the SAME partition boundaries (the range
    partitioner samples its input; recomputing it twice on a
    nondeterministic upstream could disagree)."""
    ranged = (
        df.repartitionByRange(_ORDINAL_PARTS, *sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["__pid"], r["n"])
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets = {}
    acc = 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    off_expr = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    local = Window.partitionBy("__pid").orderBy(*sort_cols)
    return ranged.withColumn(
        "ordinal",
        (off_expr[F.col("__pid")] + F.row_number().over(local)).cast("bigint"),
    ).drop("__pid")


@register(
    "q70b_global_ordinals",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS ordinal
    FROM orders
    """,
    tags=("window", "ordinal", "two-phase", "scale"),
)
def q70b_global_ordinals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable global row numbering of orders by (o_orderdate, o_orderkey)
    via the two-phase range-partitioned scheme (:func:`global_ordinals`) —
    the building block for stable shard addressing, resumable exports,
    and deterministic train-data ordering. The oracle is the single-
    reducer ROW_NUMBER the two-phase plan must reproduce EXACTLY: any
    boundary or offset bug shifts some ordinal and hash-mismatches."""
    prep(spark)
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return global_ordinals(orders, ["o_orderdate", "o_orderkey"]).select(
        "o_orderkey", "ordinal"
    )
