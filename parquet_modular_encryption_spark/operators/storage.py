"""Storage-layout operators: partitioned datasets (partition pruning) and
bucketed tables (shuffle-free co-located joins).

At 100 TB, layout IS the query plan: directory partitioning turns
predicates into pruned file listings, and bucketing pre-pays the join
shuffle once at write time. q62 exercises the partitioned path end-to-end;
bucketing needs a metastore table, so it lives in tests/test_storage.py
(the driver's session should not be pointed at a scratch warehouse)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.numeric import dsum, sql_dsum
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Directory-partitioned parquet sink (hive-style key=value dirs)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


@register(
    "q62_partition_pruning",
    oracle=f"""
    SELECT CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS month_value
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1997
    GROUP BY 1, 2
    """,
    tags=("sources", "partitioning"),
)
def q62_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned dataset round-trip with partition pruning: orders are
    written partitioned by order_year, then a year-filtered aggregate reads
    back — the filter resolves against directory names (PartitionFilters),
    so non-matching years are never opened. The oracle filters the flat
    table; equality proves pruning loses nothing."""
    prep(spark)
    scratch = tempfile.mkdtemp(prefix="pme_q62_")
    orders = load(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_partitioned(orders, f"{scratch}/orders_by_year", ["order_year"])
    part = spark.read.parquet(f"{scratch}/orders_by_year")
    return (
        part.filter(F.col("order_year") == 1997)
        .groupBy(
            F.month("o_orderdate").alias("order_month"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("month_value"),
        )
    )


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a fragmented dataset into files of
    ~``target_file_bytes``. The small-files problem is the dominant
    operational failure of long-lived 100 TB tables (every file is a task +
    a namenode entry + a footer fetch); periodic compaction restores scan
    efficiency. Returns the number of output files.

    The file count is derived from the dataset's actual on-disk bytes, and
    the rewrite is one round-robin repartition — no shuffle-by-key, so it
    scales linearly with data size regardless of skew."""
    import os

    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, round(total / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return sum(
        1 for f in os.listdir(out_path) if f.endswith(".parquet")
    )


def sorted_layout(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int
) -> None:
    """Range-clustered data layout: repartitionByRange + sortWithinPartitions
    before writing, so each parquet row group covers a narrow range of
    ``sort_cols``. Row-group min/max statistics then let ANY engine skip
    row groups on range predicates — the poor man's Z-order, and the right
    single-dimension clustering for time-series fact tables."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
