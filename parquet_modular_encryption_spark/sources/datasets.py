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
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to ``TimestampType`` (µs, UTC)
    regardless of the on-disk parquet encoding.

    The driver has regenerated ``events.parquet`` with different encodings
    across rounds — ``TIMESTAMP(NANOS)`` (surfaced as BIGINT nanos via the
    ``spark.sql.legacy.parquet.nanosAsLong`` conf set in session.prep),
    then plain ``timestamp[us]`` with no timezone, which Spark reads as
    ``TIMESTAMP_NTZ``. Downstream operators use ``unix_micros`` which
    requires ``TIMESTAMP``, so adapt to whatever is on disk:

    * BIGINT nanos → exact integer DIV 1000 (data is µs-resolution) then
      ``timestamp_micros``;
    * TIMESTAMP_NTZ → cast to TIMESTAMP. The session timezone is pinned
      UTC (session.py), so the cast is value-preserving and matches the
      DuckDB oracle's naive-UTC semantics;
    * TIMESTAMP → already correct, no-op.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dtype = df.schema[col].dataType
    if isinstance(dtype, T.LongType):
        # TIMESTAMP(NANOS) surfaced as BIGINT by the nanosAsLong conf —
        # or, should a future regeneration write plain int64 epoch-µs,
        # values 1000× smaller. Disambiguate per value: epoch-nanos
        # exceeds 1e17 for any date past mid-1973, while epoch-micros
        # stays below 1e15 until year ~33658, so the 1e17 threshold is
        # unambiguous for any plausible event time.
        micros = F.when(
            F.abs(F.col(col)) > F.lit(100_000_000_000_000_000),
            F.expr(f"{col} DIV 1000"),
        ).otherwise(F.col(col))
        df = df.withColumn(col, F.timestamp_micros(micros))
    elif isinstance(dtype, T.TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views (for spark.sql-based operators)."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
