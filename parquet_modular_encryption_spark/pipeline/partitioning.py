"""Shared partitioning guards for explosive self-joins.

:func:`pinned` started life as a private helper inside ``dedup`` and became
load-bearing in three modules (dedup's block/band self-joins, similarity's
embedding banding, multimodal's pHash banding) — it is the engine-wide
defense against a measured AQE failure mode, so it lives here as a public
helper rather than as a single-underscore internal imported cross-module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pinned(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition by join keys with an EXPLICIT partition count — the
    explosive-self-join guard. AQE sizes a stage by its shuffle-READ
    bytes, and an LSH bands frame is tiny (a few MB for 10^5 docs) even
    when its self-join OUTPUT is 10^7-10^8 pairs, so AQE coalesces the
    pair-generating stage down to ONE task and the whole join serializes
    — measured on a planted 6k-member bucket: 83 of 86 s wall on a single
    task, in the salted variant too (key salting cannot help a stage that
    has one task). An explicit numPartitions is exempt from AQE
    coalescing, so pinning to the session's shuffle-partition count
    restores the parallelism the input-bytes heuristic threw away; both
    self-join sides derive from the one repartitioned frame, so the
    exchange is computed once and reused."""
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # "auto" or unset
        n = spark.sparkContext.defaultParallelism
    return df.repartition(n, *cols)


def widened(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition UP to the session parallelism when the
    input arrives narrower — the tiny-file trap (r15): a small corpus
    parquet is one scan partition, so any expensive per-row map above it
    (gram md5 hashing, shingle construction — the checkpointed array
    builds) runs single-threaded while the rest of the machine idles
    (measured: q45b's fingerprint checkpoint was a 6 s one-task stage at
    sf0.1). Never narrows a wide input — at production scale the scan
    already arrives wider than the session parallelism and this is a
    no-op — so the extra (tiny) exchange exists exactly when the input
    was too small for its compute. Round-robin with Spark's default
    sort-before-repartition stays retry-deterministic, and every
    consumer below these sites is key-partitioned aggregation/join work,
    so results are partitioning-independent.

    CALL-SITE RESTRICTION (ADVICE r15): the width probe is
    ``df.rdd.getNumPartitions()``, and accessing ``.rdd`` under AQE
    finalizes the physical plan — on a frame with an exchange or an
    Arrow map below it that can EXECUTE upstream stages as an extra job
    per call. Every current call site is a scan+project (plan-only,
    no job); keep it that way — widen at the scan, never above a
    shuffle, checkpoint or mapInArrow."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
