"""Pandas-UDF-backed operators — the escape hatch for semantics the
built-in operators can't express (SURVEY.md §2B preference order: this is
tier (b), used sparingly; everything else in this engine is tier (a)).

q64 demonstrates the full applyInPandas contract with an operator whose
result is still oracle-checkable: per-group percentile ranking uses only
integer ranks and exact divisions, so the Python path produces the same
values SQL window functions do — proving the Arrow batch plumbing without
giving up the correctness gate."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load

RANK_SCHEMA = (
    "c_custkey bigint, c_mktsegment string, c_acctbal double, "
    "bal_rank int, pct_rank double"
)


def _rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-segment percentile rank of account balance (rank method 'min'
    == SQL RANK(); pct = (rank-1)/(n-1) == SQL percent_rank())."""
    n = len(pdf)
    rank = pdf["c_acctbal"].rank(method="min", ascending=True).astype("int64")
    out = pdf[["c_custkey", "c_mktsegment", "c_acctbal"]].copy()
    out["bal_rank"] = rank.astype("int32")
    out["pct_rank"] = (rank - 1) / (n - 1) if n > 1 else 0.0
    return out


@register(
    "q64_pandas_percentile_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(rank() OVER w AS INT) AS bal_rank,
           percent_rank() OVER w AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    """,
    tags=("pandas", "window"),
)
def q64_pandas_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map operator: per-segment percentile ranking.

    Scale notes: one shuffle on the group key, then each group becomes a
    single Arrow-backed pandas frame in a worker — groups must fit in
    worker memory (segments here are ~n/5 rows; salt or pre-aggregate when
    a group can't). The oracle is the SQL window twin, so the Python path
    is value-checked, not just smoke-checked."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").applyInPandas(_rank_group, RANK_SCHEMA)
