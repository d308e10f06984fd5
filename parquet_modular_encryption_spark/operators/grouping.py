"""Grouping sets (ROLLUP / CUBE) and pivot.

GROUPING() columns are returned alongside the (nullable) dimension values so
subtotal rows are unambiguous — required for the order-insensitive oracle
hash to line up."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.numeric import dsum, sql_dsum
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
