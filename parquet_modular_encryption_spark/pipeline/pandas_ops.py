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

# Value-range bucket width for the two-pass rank: each applyInPandas group
# is one (segment, bucket) slice, never a whole segment. The width is the
# group-size knob: narrower buckets bound each group tighter (shrink it as
# the corpus grows), wider buckets amortize the per-group Arrow-batch
# overhead (measured at sf0.1: width 100 → 550 ~27-row groups, 2.8 s;
# width 1000 → 55 groups, 1.3 s; the naive whole-segment version is 0.4 s
# but unbounded). The offsets aggregate stays tiny either way.
RANK_BUCKET_WIDTH = 1000.0


def _rank_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Rank one (segment, value-bucket) slice: local 'min'-method rank plus
    the precomputed count of segment rows in lower buckets == global SQL
    RANK(); pct = (rank-1)/(n_segment-1) == SQL percent_rank(). Ties have
    equal values and therefore share a bucket, so cross-bucket offsets are
    exact."""
    local = pdf["c_acctbal"].rank(method="min", ascending=True).astype("int64")
    rank = local + int(pdf["rank_offset"].iloc[0])
    n = int(pdf["n_segment"].iloc[0])
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
    """applyInPandas grouped-map operator: per-segment percentile ranking,
    bounded for scale via two-pass bucketed ranking.

    A naive groupBy(segment).applyInPandas holds ~n/5 rows as ONE pandas
    frame per worker — an executor OOM at 100×. Instead: (1) a tiny
    (segment, value-bucket) count aggregate, prefix-summed per segment,
    gives every bucket its global rank offset and segment size; (2)
    applyInPandas runs per (segment, bucket) — group size is bounded by
    bucket width, not corpus size — and adds the offset to the local rank.
    Equal values always share a bucket, so RANK() ties are exact. The
    offsets join is a genuine bounded broadcast (segments × buckets rows).
    The oracle is the SQL window twin, so the Python path is value-checked,
    not just smoke-checked."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    prep(spark)
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    bucketed = cust.withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / RANK_BUCKET_WIDTH).cast("int")
    )
    counts = bucketed.groupBy("c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("n_in_bucket")
    )
    per_seg = Window.partitionBy("c_mktsegment")
    cumul = per_seg.orderBy("bal_bucket")
    offsets = counts.select(
        "c_mktsegment",
        "bal_bucket",
        (F.sum("n_in_bucket").over(cumul) - F.col("n_in_bucket")).alias("rank_offset"),
        F.sum("n_in_bucket").over(per_seg).alias("n_segment"),
    )
    enriched = bucketed.join(F.broadcast(offsets), ["c_mktsegment", "bal_bucket"])
    return enriched.groupBy("c_mktsegment", "bal_bucket").applyInPandas(
        _rank_bucket, RANK_SCHEMA
    )


@register(
    "q100_pandas_scalar_udf",
    oracle="""
    SELECT o_orderkey,
           o_totalprice,
           floor((o_totalprice * 0.07 + least(o_totalprice, 50000.0) * 0.03) * 100.0
                 + 0.5) / 100.0 AS fee,
           (o_totalprice > 300000.0) AS is_jumbo
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
    tags=("pandas", "scalar-udf"),
)
def q100_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (Arrow-batched, SIMD-friendly numpy
    inside): a tiered fee schedule applied per row. The oracle is the same
    closed-form in SQL, proving the Python batch path computes exactly what
    the JVM expression would — the template for numerical feature
    engineering that outgrows SQL expressions. The 2-decimal quantization
    is floor(x*100+0.5)/100 in BOTH engines — numpy.round/SQL round are
    NOT portable (HALF_EVEN vs HALF_UP on the exact ..5 ties money data
    produces); floor of the identical double is.

    Scale: one Arrow batch stream per partition, zero shuffles; ~10-100×
    the throughput of a row-at-a-time Python UDF."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    prep(spark)

    @pandas_udf("double")
    def fee(total: pd.Series) -> pd.Series:
        t = total.to_numpy()
        raw = t * 0.07 + np.minimum(t, 50000.0) * 0.03
        return pd.Series(np.floor(raw * 100.0 + 0.5) / 100.0)

    @pandas_udf("boolean")
    def is_jumbo(total: pd.Series) -> pd.Series:
        return pd.Series(total.to_numpy() > 300000.0)

    orders = load(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        "o_totalprice",
        fee("o_totalprice").alias("fee"),
        is_jumbo("o_totalprice").alias("is_jumbo"),
    )
