"""Time-window operators over the events table (batch form).

These are the batch equivalents of the streaming operators in
``streaming/`` — same F.window / session-gap semantics, expressed so a
DuckDB oracle can check them. The streaming variants (watermarks, late-data
handling) are tested in tests/test_streaming.py with a memory sink.

Scale notes: tumbling/sliding windows are plain hash aggregations on
(window, key) — map-side partials, no sort. Sessionization shuffles once on
user_id; the per-user sort is bounded by a user's event count."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.numeric import dsum, sql_dsum
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load


@register(
    "q30_tumbling_window",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "time"),
)
def q30_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows via F.window (the streaming-native operator,
    here in batch). With UTC session TZ, window starts equal date_trunc."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


@register(
    "q31_sliding_window",
    oracle=f"""
    WITH assigned AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, value FROM events
        UNION ALL
        SELECT CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP) AS win_start, value
        FROM events
    )
    SELECT win_start, COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value
    FROM assigned
    GROUP BY win_start
    """,
    tags=("window", "time", "sliding"),
)
def q31_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour: each event lands in 2 windows.
    The oracle replicates the window assignment with a 2-way UNION ALL."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
    )


@register(
    "q32_sessionize",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           COUNT(*) AS n_events,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) AS session_end_us,
           {sql_dsum('value')} AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("window", "session"),
)
def q32_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via gaps-and-islands: lag →
    new-session flag → running count → per-session aggregates. The batch
    twin of streaming session_window."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(wrun).cast("int"))
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
        dsum("value").alias("session_value"),
    )


@register(
    "q33_event_dedup_earliest",
    oracle="""
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us FROM (
        SELECT user_id, event_type, event_id, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("dedup", "window"),
)
def q33_event_dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest event — the deterministic version of
    dropDuplicates (which keeps an arbitrary row). Batch twin of streaming
    dropDuplicates-with-watermark."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"))
    )


@register(
    "q67_session_window_batch",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("window", "session"),
)
def q67_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator in batch mode, cross-checked
    against the gaps-and-islands formulation (q32's manual construction is
    the oracle here): session end = last event + gap, per the operator's
    definition. Validates the built-in's merge semantics exactly."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("s.start")).alias("session_start_us"),
            F.unix_micros(F.col("s.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


MIN_EVENTS_PER_DAY = 3  # a day counts as "active" at this event volume


@register(
    "q81_activity_streaks",
    oracle=f"""
    WITH active_days AS (
        SELECT user_id, CAST(ts AS DATE) AS d
        FROM events
        GROUP BY user_id, CAST(ts AS DATE)
        HAVING COUNT(*) >= {MIN_EVENTS_PER_DAY}
    ), islands AS (
        SELECT user_id, d,
               date_diff('day', DATE '2024-01-01', d)
                   - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM active_days
    ), streaks AS (
        SELECT user_id, grp, COUNT(*) AS streak_days,
               MIN(d) AS streak_start, MAX(d) AS streak_end
        FROM islands
        GROUP BY user_id, grp
    )
    SELECT user_id,
           COUNT(*) AS n_streaks,
           MAX(streak_days) AS longest_streak,
           CAST(SUM(streak_days) AS BIGINT) AS total_active_days,
           MIN(streak_start) AS first_active_day,
           MAX(streak_end) AS last_active_day
    FROM streaks
    GROUP BY user_id
    """,
    tags=("window", "gaps-islands"),
)
def q81_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks via the row_number-difference
    gaps-and-islands technique (the calendar-adjacency dual of q32's
    time-gap sessionization): day - row_number() is constant within each
    run of consecutive active days. Scale: the day-level pre-aggregation
    shrinks the stream ~events-per-day-fold before the single per-user
    window shuffle; all three aggregations share the user_id partitioning
    so Catalyst reuses one exchange."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    active = (
        ev.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MIN_EVENTS_PER_DAY)
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = active.select(
        "user_id",
        "d",
        (F.datediff("d", F.lit("2024-01-01").cast("date")) - F.row_number().over(w)).alias("grp"),
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_days").alias("longest_streak"),
        F.sum("streak_days").alias("total_active_days"),
        F.min("streak_start").alias("first_active_day"),
        F.max("streak_end").alias("last_active_day"),
    )


SPINE_START, SPINE_END = "2024-01-01", "2024-01-30"


@register(
    "q84_inactive_days_spine",
    oracle=f"""
    WITH spine AS (
        SELECT unnest(generate_series(DATE '{SPINE_START}', DATE '{SPINE_END}',
                                      INTERVAL 1 DAY))::DATE AS d
    ), users AS (
        SELECT DISTINCT user_id FROM events
    ), active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT u.user_id,
           COUNT(*) AS n_inactive_days,
           MIN(s.d) AS first_inactive_day,
           MAX(s.d) AS last_inactive_day
    FROM users u CROSS JOIN spine s
    LEFT JOIN active a ON a.user_id = u.user_id AND a.d = s.d
    WHERE a.user_id IS NULL
    GROUP BY u.user_id
    """,
    tags=("generator", "spine", "anti-join"),
)
def q84_inactive_days_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap detection: generate the calendar with sequence()
    (a generator source — no input table), cross join the user dimension,
    anti-join observed activity → days with NO events per user. Scale: the
    spine is |days|×|users| rows but only (user, day) pairs — tiny next to
    the event stream it indexes; the anti join shuffles on (user_id, d)
    after the distinct pre-aggregation shrinks the probe side."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(SPINE_START).cast("date"),
                F.lit(SPINE_END).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    users = ev.select("user_id").distinct()
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    grid = users.crossJoin(F.broadcast(spine))
    inactive = grid.join(active, ["user_id", "d"], "left_anti")
    return inactive.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_inactive_days"),
        F.min("d").alias("first_inactive_day"),
        F.max("d").alias("last_inactive_day"),
    )


@register(
    "q89_map_profile",
    oracle=f"""
    WITH per_type AS (
        SELECT user_id, event_type, {sql_dsum('value')} AS type_value
        FROM events
        GROUP BY user_id, event_type
    )
    SELECT user_id,
           COUNT(*) AS n_types,
           MAX(CASE WHEN event_type = 'click' THEN type_value END) AS click_value,
           MAX(CASE WHEN event_type = 'purchase' THEN type_value END) AS purchase_value
    FROM per_type
    GROUP BY user_id
    """,
    tags=("map", "agg"),
)
def q89_map_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-user event_type→value map built with
    map_from_entries(collect_list(struct(...))), then consumed via
    map_keys/element_at. The map column is genuine plumbing (schema
    map<string,decimal>) — the oracle checks the scalars extracted from it,
    since engines cannot hash-compare raw maps portably. Scale: one shuffle
    to (user, type) partials, a second tiny one to the per-user map — the
    map never exceeds |event types| entries per row."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        dsum("value").alias("type_value")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "type_value"))
        ).alias("profile")
    )
    return mapped.select(
        "user_id",
        F.size(F.map_keys(F.col("profile"))).cast("bigint").alias("n_types"),
        F.element_at(F.col("profile"), "click").alias("click_value"),
        F.element_at(F.col("profile"), "purchase").alias("purchase_value"),
    )


@register(
    "q96_map_higher_order",
    oracle=f"""
    WITH per_type AS (
        SELECT user_id, event_type,
               CAST(floor(SUM(CAST(value AS DECIMAL(38,10))) * 10000) AS BIGINT) AS tv_i4
        FROM events GROUP BY user_id, event_type
    ), with_share AS (
        SELECT user_id, event_type,
               CAST(tv_i4 AS DOUBLE)
                   / CAST(SUM(tv_i4) OVER (PARTITION BY user_id) AS DOUBLE)
                   AS share
        FROM per_type
    )
    SELECT user_id, event_type, share
    FROM with_share
    WHERE share >= 0.25
    """,
    tags=("map", "higher-order"),
)
def q96_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: the per-user event_type→value map is
    normalized with transform_values (share of the user's total), pruned
    with map_filter (dominant types only), and exploded back to rows.
    The oracle computes identical shares relationally — the map lambdas are
    the Spark-side plumbing under test. Per-type sums are floored to exact
    scale-4 BIGINTs and the per-user total is an exact integer sum, so both
    division operands — and hence the IEEE double shares — are bit-identical
    in both engines (re-summing floored doubles would be order-dependent)."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.floor(F.sum(F.col("value").cast("decimal(38,10)")) * 10000)
        .cast("bigint")
        .alias("tv_i4")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "tv_i4"))
        ).alias("profile"),
        F.sum("tv_i4").alias("total"),
    )
    shares = mapped.select(
        "user_id",
        F.map_filter(
            F.transform_values(
                F.col("profile"),
                lambda k, v: v.cast("double") / F.col("total").cast("double"),
            ),
            lambda k, v: v >= 0.25,
        ).alias("dominant"),
    )
    return shares.select(
        "user_id", F.explode("dominant").alias("event_type", "share")
    )


@register(
    "q97_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id, value,
               epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   - epoch_us(ts) AS dur_us
        FROM events
    )
    SELECT user_id,
           CAST(SUM(CAST(floor(value * dur_us / 10000.0) AS BIGINT)) AS BIGINT) AS wsum_q,
           CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
           (CAST(SUM(CAST(floor(value * dur_us / 10000.0) AS BIGINT)) AS DOUBLE) / 100.0)
               / (CAST(SUM(dur_us) AS DOUBLE) / 1e6) AS time_weighted_avg
    FROM seq
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
    tags=("window", "time-weighted"),
)
def q97_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of a telemetry signal: each reading holds its
    value until the next one (step interpolation), so the mean weights each
    value by its holding duration — the correct aggregate for irregularly
    sampled metrics. Determinism: duration micros are exact integers, the
    value×duration product is one IEEE multiply (identical in both
    engines), and the tie-free floor quantization makes the weighted sum an
    exact bigint before the final double division."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    seq = ev.select("user_id", "value", dur.alias("dur_us")).filter(
        F.col("dur_us").isNotNull()
    )
    wsum_q = F.sum(
        F.floor(F.col("value") * F.col("dur_us") / F.lit(10000.0)).cast("bigint")
    )
    total_dur = F.sum("dur_us")
    return seq.groupBy("user_id").agg(
        wsum_q.alias("wsum_q"),
        total_dur.alias("total_dur_us"),
        (
            (wsum_q.cast("double") / 100.0) / (total_dur.cast("double") / 1e6)
        ).alias("time_weighted_avg"),
    )


@register(
    "q99_conversion_funnel",
    oracle="""
    WITH su AS (
        SELECT user_id, MIN(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), ck AS (
        SELECT e.user_id, MIN(e.ts) AS click_ts
        FROM events e JOIN su ON e.user_id = su.user_id
        WHERE e.event_type = 'click' AND e.ts > su.signup_ts
        GROUP BY e.user_id
    ), pu AS (
        SELECT e.user_id, MIN(e.ts) AS purchase_ts
        FROM events e JOIN ck ON e.user_id = ck.user_id
        WHERE e.event_type = 'purchase' AND e.ts > ck.click_ts
        GROUP BY e.user_id
    )
    SELECT su.user_id,
           epoch_us(su.signup_ts) AS signup_us,
           epoch_us(ck.click_ts) AS click_us,
           epoch_us(pu.purchase_ts) AS purchase_us,
           (ck.user_id IS NOT NULL) AS reached_click,
           (pu.user_id IS NOT NULL) AS reached_purchase
    FROM su
    LEFT JOIN ck ON su.user_id = ck.user_id
    LEFT JOIN pu ON su.user_id = pu.user_id
    """,
    tags=("funnel", "sequence"),
)
def q99_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → first later click → first later
    purchase): each stage is the earliest qualifying event strictly after
    the previous stage — the product-analytics sequence query. Scale: three
    narrow aggregates joined on user_id; every stage input is pre-filtered
    by event_type before the shuffle, and all three joins share the
    user_id partitioning so AQE coalesces them into one exchange chain."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    ck = (
        ev.filter(F.col("event_type") == "click")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(ck, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        su.join(ck, "user_id", "left")
        .join(pu, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("signup_ts").alias("signup_us"),
            F.unix_micros("click_ts").alias("click_us"),
            F.unix_micros("purchase_ts").alias("purchase_us"),
            F.col("click_ts").isNotNull().alias("reached_click"),
            F.col("purchase_ts").isNotNull().alias("reached_purchase"),
        )
    )


@register(
    "q99b_retention_cohorts",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ), cohort AS (
        SELECT user_id, MIN(wk) AS cw FROM act GROUP BY user_id
    )
    SELECT CAST(c.cw AS DATE) AS cohort_week,
           CAST(date_diff('day', c.cw, a.wk) // 7 AS INT) AS offset_week,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("events", "cohort", "retention"),
)
def q99b_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix — the classic product-analytics triangle:
    users cohorted by first-activity ISO week, counted at each later week
    offset they return. Both engines truncate to Monday-start weeks, so
    the day difference is an exact multiple of 7 and the offset is exact
    integer division.

    Scale shape: ONE user-keyed aggregation collapses the event stream to
    a per-user distinct-week set (partial collect_set combines map-side,
    so the shuffle carries at most users x weeks rows' worth of data —
    never event volume); the cohort week is array_min of that set and the
    offsets explode from it, so the naive formulation's separate distinct
    + cohort-agg + user join (three extra corpus-keyed exchanges —
    measured 12 vs 6 in PLANS.md) disappears. After the explode each
    (user, week) is unique by construction, so the final cell count is a
    plain COUNT, not COUNT(DISTINCT) — no expand."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.collect_set(F.date_trunc("week", F.col("ts"))).alias("wks")
    )
    return (
        per_user.select(
            "user_id",
            F.array_min("wks").alias("cw"),
            F.explode("wks").alias("wk"),
        )
        .select(
            F.to_date("cw").alias("cohort_week"),
            F.expr("CAST(datediff(wk, cw) div 7 AS INT)").alias("offset_week"),
        )
        .groupBy("cohort_week", "offset_week")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "offset_week")
    )


@register(
    "q97b_ohlc_bars",
    oracle="""
    WITH ranked AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
               event_type, value,
               row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT win_start, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
               AS volume_fp
    FROM ranked
    GROUP BY 1, 2
    """,
    tags=("window", "time", "ohlc"),
)
def q97b_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar aggregation — the time-series downsampling shape (metric
    rollups, market bars, telemetry compaction): per hour x event type,
    the opening and closing values (argmin/argmax over the composite
    (ts, event_id) key — the id tie-break makes same-timestamp opens
    deterministic, the q110b struct-ordering pattern), the high/low
    extremes, and a fixed-point volume (floor-scaled BIGINT sum —
    double addition is not associative across agg orders, integers are).

    One map-side-combined hash aggregation: open/close ride the same
    shuffle as the min/max/count — no window, no sort, no second pass.
    That is what makes bars cheap enough to maintain continuously at
    scale (contrast a per-window ORDER BY ts LIMIT 1 formulation, which
    sorts every group)."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 10000).cast("bigint"))
            .cast("bigint")
            .alias("volume_fp"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume_fp",
        )
    )


# Rolling anomaly detection (q97c): trailing-history window + integer z-test
ANOMALY_HIST = 100  # trailing events per user considered
ANOMALY_MIN_HIST = 20  # warm-up: no verdict before this much history
ANOMALY_Z = 3  # flag |z| > 3


@register(
    "q97c_rolling_anomaly",
    oracle=f"""
    WITH fp AS (
        SELECT event_id, user_id, event_type, ts,
               CAST(floor(value * 10000) AS BIGINT) AS vfp
        FROM events
    ), roll AS (
        SELECT event_id, user_id, event_type, vfp,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_hist,
               CAST(SUM(vfp) OVER w AS BIGINT) AS s,
               CAST(SUM(vfp * vfp) OVER w AS BIGINT) AS ss
        FROM fp
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {ANOMALY_HIST} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, event_type, vfp, n_hist,
           CAST(n_hist * vfp - s AS BIGINT) AS dev_num,
           CAST(n_hist * ss - s * s AS BIGINT) AS var_num
    FROM roll
    WHERE n_hist >= {ANOMALY_MIN_HIST}
      AND (n_hist * vfp - s) * (n_hist * vfp - s)
          > {ANOMALY_Z * ANOMALY_Z} * (n_hist * ss - s * s)
    """,
    tags=("window", "anomaly", "time"),
)
def q97c_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection — the telemetry/metrics outlier
    flagger: each event is tested against its user's TRAILING
    {ANOMALY_HIST}-event history (the frame excludes the current row, so
    an outlier cannot contaminate its own baseline), flagged when
    z^2 > {ANOMALY_Z}^2. The test is pure BIGINT: with fixed-point values
    v, z^2 > k^2 is equivalent to (n*v - S)^2 > k^2*(n*SS - S^2) — no
    float mean/std anywhere, so the flagged set is hash-checked exactly.
    A {ANOMALY_MIN_HIST}-event warm-up suppresses verdicts on thin
    history. Fixed-point range: with window n={ANOMALY_HIST} the largest
    intermediate is max((n*v - S)^2, k^2*(n*SS - S^2)) <= max(4, k^2) *
    n^2 * v^2, so BIGINT safety (< 2^63 ~ 9.2e18) requires the
    fixed-point |v| <= ~1e7 — i.e. raw values <= ~1e3 at the 1e4 scale
    used here (NOT the ~3e8 an n*v-only analysis suggests; the n*SS term
    dominates). Larger magnitudes need a narrower scale or a DOUBLE
    fallback; the events table's value column sits well inside the bound.

    Scale: one shuffle on user_id; the running-frame window sorts within
    a user's bounded event stream — the same shape q20/q32 already
    carry, and the streaming analogue is a transformWithState rolling
    aggregate."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    fp = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.floor(F.col("value") * 10000).cast("bigint").alias("vfp"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOMALY_HIST, -1)
    )
    roll = fp.select(
        "event_id",
        "user_id",
        "event_type",
        "vfp",
        F.count(F.lit(1)).over(w).alias("n_hist"),
        F.sum("vfp").over(w).alias("s"),
        F.sum(F.col("vfp") * F.col("vfp")).over(w).alias("ss"),
    )
    dev = F.col("n_hist") * F.col("vfp") - F.col("s")
    var_num = F.col("n_hist") * F.col("ss") - F.col("s") * F.col("s")
    return (
        roll.filter(
            (F.col("n_hist") >= ANOMALY_MIN_HIST)
            & (dev * dev > F.lit(ANOMALY_Z * ANOMALY_Z) * var_num)
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            "vfp",
            "n_hist",
            dev.cast("bigint").alias("dev_num"),
            var_num.cast("bigint").alias("var_num"),
        )
    )
