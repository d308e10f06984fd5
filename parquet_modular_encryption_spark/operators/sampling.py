"""Deterministic sampling & dataset-split operators.

A 100 TB training pipeline cannot use ``df.sample()`` for train/val/test
splits: nondeterministic sampling makes splits unreproducible across reruns
and engines, and re-shuffling data leaks validation rows into training. The
standard fix (used by every large-scale corpus pipeline) is HASH-BASED
assignment: a row's split is a pure function of its primary key, so the
assignment is stable under re-partitioning, engine changes, incremental
appends, and backfills.

Both operators use md5 — present with identical semantics in Spark and
DuckDB — so they are fully oracle-checkable, unlike rand()-based sampling.

Scale notes: split assignment is a stateless projection (no shuffle, fully
pipelined in codegen); the stratified sample is one window shuffle on the
stratum key, the same cost as any per-group top-k.

Reference parity: the reference has no sampling surface; this is §2B
expansion (training-data pipeline operators, BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.text import hash60, sql_hash60
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load

# First hex char of md5(key): '0'..'9','a','b' → train (12/16 = 75%),
# 'c','d' → val (12.5%), 'e','f' → test (12.5%).
_TRAIN_MAX, _VAL_MAX = "b", "d"


def split_of(key: Column) -> Column:
    """Deterministic train/val/test assignment from a key column."""
    h = F.substring(F.md5(key.cast("string")), 1, 1)
    return (
        F.when(h <= _TRAIN_MAX, F.lit("train"))
        .when(h <= _VAL_MAX, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def sql_split_of(expr: str) -> str:
    """DuckDB twin of :func:`split_of`."""
    return (
        f"CASE WHEN substr(md5(CAST({expr} AS VARCHAR)), 1, 1) <= '{_TRAIN_MAX}' THEN 'train' "
        f"WHEN substr(md5(CAST({expr} AS VARCHAR)), 1, 1) <= '{_VAL_MAX}' THEN 'val' "
        f"ELSE 'test' END"
    )


@register(
    "q75_train_val_test_split",
    oracle=f"""
    SELECT {sql_split_of('doc_id')} AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY split, lang
    """,
    tags=("sampling", "split"),
)
def q75_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based train/val/test split of the document corpus with per-split
    per-language accounting. The assignment is a pure projection over
    md5(doc_id) — stable under re-partitioning and appends, identical in
    every engine, and free at scale (no shuffle until the final small agg)."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", split_of(F.col("doc_id")))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        )
    )


SAMPLE_PER_STRATUM = 20


@register(
    "q76_stratified_sample",
    oracle=f"""
    SELECT c_mktsegment, c_custkey, CAST(rn AS INT) AS sample_rank
    FROM (
        SELECT c_mktsegment, c_custkey,
               row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey
               ) AS rn
        FROM customer
    )
    WHERE rn <= {SAMPLE_PER_STRATUM}
    """,
    tags=("sampling", "stratified"),
)
def q76_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: fixed-size per-stratum sample
    selected by md5 order — a reproducible 'random' draw (md5 is a uniform
    permutation of the keys) that every engine agrees on, unlike
    sampleBy()'s RNG. One window shuffle on the stratum key; at scale the
    rank-truncation is pushed into the shuffle by the window top-k rewrite
    (same physical shape as q22)."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey"))
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            F.row_number().over(w).alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= SAMPLE_PER_STRATUM)
    )


_SQL_H60 = sql_hash60("CAST(doc_id AS VARCHAR)")


@register(
    "q76b_weighted_sample",
    oracle=f"""
    SELECT doc_id, source,
           CAST({_SQL_H60} % 10000 AS BIGINT) AS draw_bp,
           CAST((1 + CAST(substr(source, 4) AS INT) % 4) * 2000 AS BIGINT) AS rate_bp
    FROM documents
    WHERE {_SQL_H60} % 10000
          < (1 + CAST(substr(source, 4) AS INT) % 4) * 2000
    """,
    tags=("sampling", "weighted"),
)
def q76b_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional (weighted) sampling without an RNG: each
    document draws a uniform basis-point value from the shared md5-based
    60-bit hash of its id, and is kept when the draw falls under its
    source's configured rate (here 20/40/60/80% derived from the source
    id). Pure integer comparisons — reproducible across engines, runs,
    and repartitioning, and each source's kept fraction converges to its
    rate. Scale: a stateless map-side filter, zero shuffles; changing
    rates re-selects deterministically (stable sample membership under
    rate increases — a kept doc stays kept when its rate only grows)."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    draw = hash60(F.col("doc_id").cast("string")) % 10000
    rate = (1 + F.substring("source", 4, 10).cast("int") % 4) * 2000
    return (
        docs.select(
            "doc_id",
            "source",
            draw.cast("bigint").alias("draw_bp"),
            rate.cast("bigint").alias("rate_bp"),
        )
        .filter(F.col("draw_bp") < F.col("rate_bp"))
    )
