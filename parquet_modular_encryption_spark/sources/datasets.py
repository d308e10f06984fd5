"""Loaders for the driver-generated parquet tables (TESTDATA.md).

``spark.read.parquet`` is the scale path: Catalyst pushes projections and
predicates into the scan, and partition-level parallelism comes from
parquet row groups / file splits. At 100 TB these would be
directory-partitioned datasets; the loader API stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are fixed-cardinality; part/supplier/customer grow with SF
# but stay orders of magnitude below the fact tables).
BROADCAST_SAFE = {"region", "nation", "supplier", "part"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's reader
        # rejects; session conf `spark.sql.legacy.parquet.nanosAsLong`
        # (set in session.prep) surfaces it as nanos-since-epoch BIGINT.
        # Convert to a µs TimestampType with exact integer arithmetic
        # (the data is µs-resolution, so DIV 1000 is lossless).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views (for spark.sql-based operators)."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
