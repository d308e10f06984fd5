"""Grouping sets (ROLLUP / CUBE) and pivot.

GROUPING() columns are returned alongside the (nullable) dimension values so
subtotal rows are unambiguous — required for the order-insensitive oracle
hash to line up."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.numeric import (
    dsum,
    dsum_finalize,
    dsum_partial,
    sql_dsum,
)
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load


@register(
    "q23_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           {sql_dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("grouping",),
)
def q23_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals + grand total."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q24_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("grouping",),
)
def q24_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^n grouping-set combinations."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_value"),
    )


@register(
    "q29_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_open,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_filled,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("pivot",),
)
def q29_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (conditional-aggregation equivalent)."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    qty_o = F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))
    qty_f = F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))
    return li.groupBy("l_returnflag").agg(
        dsum(qty_o).alias("qty_open"),
        dsum(qty_f).alias("qty_filled"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q65_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n_rows,
           {sql_dsum('l_extendedprice')} AS total_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("grouping",),
)
def q65_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (an arbitrary subset of the cube lattice) via
    Spark SQL — the general form behind rollup/cube."""
    prep(spark)
    from parquet_modular_encryption_spark.sources.datasets import view

    view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n_rows,
               {sql_dsum('l_extendedprice')} AS total_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


HIST_WIDTH = 50_000.0  # o_totalprice bucket width
HIST_BUCKETS = 10


@register(
    "q82_price_histogram",
    oracle=f"""
    SELECT CAST(least(floor(o_totalprice / {HIST_WIDTH}), {HIST_BUCKETS - 1}) AS INT)
               AS bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY bucket
    """,
    tags=("agg", "histogram"),
)
def q82_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as a stateless bucket projection + groupBy —
    the distributed histogram shape (width_bucket semantics, written as an
    explicit floor so both engines evaluate the identical IEEE expression).
    One map-side-combinable shuffle of at most {HIST_BUCKETS} groups."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / HIST_WIDTH), F.lit(HIST_BUCKETS - 1)
    ).cast("int")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        dsum("o_totalprice").alias("total_price"),
    )


N_SALTS = 16


@register(
    "q86_salted_aggregation",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "skew", "salted"),
)
def q86_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for pathologically skewed group keys
    (l_returnflag has 3 values — every row lands on 3 reducers unsalted).
    Phase 1 groups on (key, salt) spreading each hot key over {N_SALTS}
    sub-groups; phase 2 re-aggregates the {N_SALTS}× smaller partials.
    The salt derivation is engine-local (it never leaves the plan), so the
    oracle is the plain one-phase GROUP BY — results are identical because
    count/sum are associative and the decimal sums are order-independent."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "__salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS))
    )
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.count(F.lit(1)).alias("pn"),
        dsum_partial("l_quantity").alias("pq"),
        dsum_partial("l_extendedprice").alias("pp"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n_rows"),
        dsum_finalize("pq").alias("sum_qty"),
        dsum_finalize("pp").alias("sum_price"),
    )


@register("q87_approx_percentiles", oracle=None, tags=("agg", "approx", "sketch"))
def q87_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the Greenwald-Khanna sketch
    (approx_percentile, accuracy 10000 → ε=1e-4): the mergeable-summary
    path for quantiles over 100 TB, where an exact percentile would need a
    global sort. Rows-only driver check (sketch internals are
    engine-specific); tests/test_properties.py asserts each value within
    sketch tolerance of the exact q66 percentiles."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    pct = F.expr(
        "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95), 10000)"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            pct.alias("pcts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            F.col("pcts")[0].alias("p25"),
            F.col("pcts")[1].alias("p50"),
            F.col("pcts")[2].alias("p75"),
            F.col("pcts")[3].alias("p95"),
            "n_rows",
        )
    )


@register(
    "q88_misc_aggregates",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           bool_or(o_orderstatus = 'F') AS any_finished,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           CAST(bit_or(CAST(1 << (EXTRACT(month FROM o_orderdate) - 1) AS BIGINT))
                AS BIGINT) AS months_mask,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "filter", "boolean", "bitwise"),
)
def q88_misc_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean/bitwise aggregate surface: FILTER-style
    conditional counts (count_if), bool_or/bool_and quantifiers, and a
    months-present bitmask via bit_or over a shifted one-hot — all
    map-side-combinable single-pass aggregates."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bit_or(
            F.expr("CAST(shiftleft(1, month(o_orderdate) - 1) AS BIGINT)")
        ).alias("months_mask"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Shuffle-key skew profiler (q86b)
# ---------------------------------------------------------------------------
SKEW_TOP_K = 10
SKEW_PPM = 1_000_000  # shares reported in exact parts-per-million


def _skew_profile_sql(column: str, table: str) -> str:
    return f"""
        SELECT '{column}' AS key_column,
               CAST({column} AS BIGINT) AS key_value,
               cnt,
               CAST((cnt * {SKEW_PPM}) // total AS BIGINT) AS share_ppm,
               CAST((cnt * n_keys * {SKEW_PPM}) // total AS BIGINT) AS skew_x_ppm,
               CAST(rn AS INT) AS rank
        FROM (
            SELECT {column}, cnt,
                   SUM(cnt) OVER () AS total,
                   COUNT(*) OVER () AS n_keys,
                   row_number() OVER (ORDER BY cnt DESC, {column}) AS rn
            FROM (SELECT {column}, COUNT(*) AS cnt FROM {table} GROUP BY {column})
        ) WHERE rn <= {SKEW_TOP_K}
    """


@register(
    "q86b_skew_profile",
    oracle=" UNION ALL ".join(
        _skew_profile_sql(c, t)
        for c, t in (
            ("l_suppkey", "lineitem"),
            ("l_partkey", "lineitem"),
            ("o_custkey", "orders"),
        )
    ),
    tags=("agg", "skew", "diagnostics"),
)
def q86b_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profiler — the diagnostic run BEFORE choosing a
    mitigation (q86's salting, AQE skew-join, broadcast): for each
    prospective join/aggregation key, the top-{SKEW_TOP_K} hottest values
    with their corpus share and skew multiplier
    (cnt x n_distinct_keys / total, = 1e6 ppm for a perfectly uniform
    key). A skew_x of ~1e6 means hash partitioning balances; 50e6 means
    the hottest key's reducer gets 50x the average and needs salting.

    All-integer fixed-point output (counts, ppm via integer division), so
    the profile is hash-checked. Scale: one hash-agg per profiled column
    (map-side combined); total/n_keys is a SCALAR aggregate broadcast
    back (never a global window over the key-count frame — with 10^9
    distinct keys that would be a SinglePartition sort); top-{SKEW_TOP_K}
    goes through orderBy().limit() = TakeOrderedAndProject (per-partition
    heaps, no full sort), and the rank window runs on the {SKEW_TOP_K}
    surviving rows only."""
    prep(spark)
    from pyspark.sql import Window

    parts = []
    for column, table in (
        ("l_suppkey", "lineitem"),
        ("l_partkey", "lineitem"),
        ("o_custkey", "orders"),
    ):
        counts = (
            load(spark, sf_dir, table)
            .groupBy(column)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        totals = counts.agg(
            F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
        )
        top = counts.orderBy(F.desc("cnt"), F.asc(column)).limit(SKEW_TOP_K)
        w = Window.orderBy(F.desc("cnt"), F.asc(column))
        parts.append(
            top.crossJoin(F.broadcast(totals))
            .withColumn("rn", F.row_number().over(w))
            .select(
                F.lit(column).alias("key_column"),
                F.col(column).cast("bigint").alias("key_value"),
                "cnt",
                F.expr(f"(cnt * {SKEW_PPM}) DIV total").alias("share_ppm"),
                F.expr(f"(cnt * n_keys * {SKEW_PPM}) DIV total").alias("skew_x_ppm"),
                F.col("rn").cast("int").alias("rank"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "q88d_join_cardinality",
    oracle=f"""
    WITH lc AS (SELECT l_orderkey AS k, COUNT(*) AS cnt_l FROM lineitem GROUP BY 1),
    oc AS (SELECT o_orderkey AS k, COUNT(*) AS cnt_o FROM orders GROUP BY 1),
    prod AS (
        SELECT lc.k, lc.cnt_l, oc.cnt_o, lc.cnt_l * oc.cnt_o AS out_rows
        FROM lc JOIN oc USING (k)
    ), tot AS (
        SELECT CAST(SUM(out_rows) AS BIGINT) AS join_rows,
               CAST(COUNT(*) AS BIGINT) AS matched_keys,
               CAST(MAX(out_rows) AS BIGINT) AS max_key_rows
        FROM prod
    )
    SELECT t.join_rows, t.matched_keys, t.max_key_rows,
           CAST(p.k AS BIGINT) AS hottest_key,
           CAST((t.max_key_rows * {SKEW_PPM}) // t.join_rows AS BIGINT)
               AS hottest_share_ppm
    FROM tot t
    JOIN prod p ON p.out_rows = t.max_key_rows
    QUALIFY row_number() OVER (ORDER BY p.k) = 1
    """,
    tags=("agg", "join", "diagnostics"),
)
def q88d_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-cardinality probe — the pre-flight check before a big
    join: |A join B on k| = sum over matched keys of cnt_A(k)*cnt_B(k),
    computed from the two KEY-COUNT frames (each a map-side-combined
    hash-agg, output |distinct keys| rows) instead of materializing the
    join itself. Reports total output rows, matched key count, and the
    hottest key's output share — the numbers that decide broadcast vs
    shuffle vs salted (q86) vs skew-hint strategy. At 100 TB this costs
    two aggregations over the join columns ONLY (column pruning keeps the
    scan narrow) while the join it sizes could be orders of magnitude
    larger."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    lc = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt_l")
    )
    oc = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt_o")
    )
    prod = lc.join(oc, "k").select(
        "k", (F.col("cnt_l") * F.col("cnt_o")).alias("out_rows")
    )
    tot = prod.agg(
        F.sum("out_rows").alias("join_rows"),
        F.count(F.lit(1)).alias("matched_keys"),
        F.max("out_rows").alias("max_key_rows"),
    )
    hottest = (
        prod.crossJoin(F.broadcast(tot))
        .filter(F.col("out_rows") == F.col("max_key_rows"))
        .orderBy("k")
        .limit(1)
    )
    return hottest.select(
        "join_rows",
        "matched_keys",
        "max_key_rows",
        F.col("k").cast("bigint").alias("hottest_key"),
        F.expr(f"(max_key_rows * {SKEW_PPM}) DIV join_rows").alias(
            "hottest_share_ppm"
        ),
    )


@register(
    "q92c_incremental_rollup",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice")} AS total_value
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "incremental", "mergeable"),
)
def q92c_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance — the mergeable-partials
    contract a continuously-maintained rollup depends on: the fact table
    is processed as two independent epochs (the q88e before/after split,
    standing in for "yesterday's materialized state" and "today's new
    data"), each epoch aggregated to exact-decimal PARTIALS, and the
    partials merged WITHOUT touching the base rows again. The oracle
    aggregates all rows in one pass — a hash match proves
    merge(partial(A), partial(B)) == aggregate(A ∪ B) exactly, decimals
    included (the single-floor-at-finalize discipline from the salted
    q86 path; flooring per-epoch would diverge in the last fixed-point
    digit).

    At 100 TB this is THE shape of a maintained rollup: each ingest
    batch contributes one partial-agg pass over the new data only, and
    the merge costs |groups|, not |rows|. Count/sum are the mergeable
    pair here; the same contract extends to any commutative monoid
    (bitmaps, HLL registers — q28/q88c's sketches merge the same way)."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    split = F.lit("1998-06-01").cast("timestamp")
    epochs = []
    for pred in (F.col("o_orderdate") < split, F.col("o_orderdate") >= split):
        epochs.append(
            orders.filter(pred)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("pn"),
                dsum_partial("o_totalprice").alias("pv"),
            )
        )
    merged = epochs[0].unionByName(epochs[1])
    return merged.groupBy("o_orderpriority").agg(
        F.sum("pn").alias("n_orders"),
        dsum_finalize("pv").alias("total_value"),
    )
