"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full registry from
``parquet_modular_encryption_spark.registry`` (one entry per implemented
operator, see SURVEY.md §2). Queries without a SQL-expressible oracle
(approx sketches, engine-specific ops) appear in ``queries()`` only and get
the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_modular_encryption_spark.registry import load_all  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pricing-summary aggregate over lineitem (sf0.001)."""
    from parquet_modular_encryption_spark.operators.relational import q01_pricing_summary

    return q01_pricing_summary(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One registered query per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
