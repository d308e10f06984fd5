"""Record-lifecycle operators: SCD Type-2 history, interval merging, and
event transition analysis.

These complete the CDC story started by q95 (latest-wins compaction,
operators/relational.py): q110 keeps the full change history as validity
ranges instead of compacting it — the slowly-changing-dimension Type 2
build every warehouse pipeline needs. q111 is the classic
merge-overlapping-intervals (islands) operator, and q112 the first-order
transition matrix over per-user event sequences.

Scale notes:
- All three shuffle exactly once on their natural key (o_orderkey /
  user_id) and then work inside the partition with window functions; the
  per-key sort is bounded by a key's row count, not the table size.
- q110's change log is synthesized deterministically from orders (same
  recipe as q95) so the DuckDB oracle replays the identical log.
- q111's island flags are tie-stable: duplicate (start, end) rows get the
  same island under any tie order, so the merged output is engine-
  identical even though window tie order is not.

Reference parity: the reference has no temporal operators (SURVEY.md §2A);
this module is expansion surface per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.numeric import dsum, sql_dsum
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load


@register(
    "q110_scd2_history",
    oracle="""
    WITH changes AS (
        SELECT o_orderkey, o_totalprice, 0 AS version FROM orders
        UNION ALL
        SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, 1 AS version
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice * 1.2 AS o_totalprice, 2 AS version
        FROM orders WHERE o_orderkey % 21 = 0
    )
    SELECT o_orderkey,
           CAST(version AS INT) AS version,
           o_totalprice,
           CAST(lead(version) OVER (PARTITION BY o_orderkey ORDER BY version)
                AS INT) AS valid_to_version,
           CASE WHEN lead(version) OVER (PARTITION BY o_orderkey ORDER BY version)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
    tags=("cdc", "scd2", "window"),
)
def q110_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 build: the same synthesized CDC log as q95, but instead
    of compacting to latest-wins, each version gets a validity range
    (valid_to_version = next version, NULL while current). lead() over the
    per-key version order — one shuffle on o_orderkey, per-key sort of at
    most 3 rows. At 100 TB the window partition is the dimension key, so
    skew equals the max versions-per-key, not table size."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_totalprice", F.lit(0).alias("version")
    )
    upd1 = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        F.lit(1).alias("version"),
    )
    upd2 = orders.filter(F.col("o_orderkey") % 21 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.2).alias("o_totalprice"),
        F.lit(2).alias("version"),
    )
    changes = base.unionAll(upd1).unionAll(upd2)
    w = Window.partitionBy("o_orderkey").orderBy("version")
    nxt = F.lead("version").over(w)
    return changes.select(
        "o_orderkey",
        F.col("version").cast("int").alias("version"),
        "o_totalprice",
        nxt.cast("int").alias("valid_to_version"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "q111_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 900000000 AS e
        FROM events
    ), flagged AS (
        SELECT user_id, s, e,
               CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                    OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_island
        FROM iv
    ), islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged
    )
    SELECT user_id,
           CAST(island AS INT) AS island_id,
           MIN(s) AS start_us,
           MAX(e) AS end_us,
           MAX(e) - MIN(s) AS covered_us,
           COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, island
    """,
    tags=("interval", "islands", "window"),
)
def q111_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping intervals (islands): each event opens a 15-minute
    interval; per user, intervals whose start falls inside the running
    max-end of earlier intervals merge into one island. The running-max
    formulation handles nested intervals ([0,100],[1,2],[50,200]) that the
    naive lag(end) check breaks on. Coverage per island is contiguous by
    construction, so covered_us = end - start. One shuffle on user_id;
    island ids restart per user so they never need a global sequence —
    that's what keeps this embarrassingly parallel at 100 TB."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 900_000_000).alias("e"),
    )
    worder = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        worder.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            worder.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return islands.groupBy("user_id", F.col("island").cast("int").alias("island_id")).agg(
        F.min("s").alias("start_us"),
        F.max("e").alias("end_us"),
        (F.max("e") - F.min("s")).alias("covered_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q112_event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    tags=("sequence", "window", "markov"),
)
def q112_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences (the
    Markov-chain input): lag(event_type) over the (ts, event_id)-ordered
    stream, then count (prev, next) pairs. The (ts, event_id) compound
    order key makes the sequence deterministic under timestamp ties.
    Scale: one shuffle on user_id for the window, then an |event_types|²
    aggregate — tiny output regardless of input size."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "q115_epoch_shard_reshuffle",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               epoch,
               CAST(concat('0x', substr(md5(concat(CAST(epoch AS VARCHAR), ':',
                    CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8 AS shard
        FROM documents
        CROSS JOIN (SELECT unnest(range(3)) AS epoch)
    )
    SELECT CAST(epoch AS INT) AS epoch,
           CAST(shard AS INT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM assigned
    GROUP BY epoch, shard
    """,
    tags=("training", "shuffle", "hash"),
)
def q115_epoch_shard_reshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch reshuffle — the training-loader operator: every
    epoch re-deals documents into 8 shards via the portable 60-bit hash of
    (epoch, doc_id), so shard membership changes each epoch yet is fully
    reproducible with no stored state or RNG. Output is the per-(epoch,
    shard) manifest (doc count + char budget) a loader would use for
    balanced scheduling. Scale: the epoch grid is a 3-row broadcasted
    cross join (rows scale as epochs × docs but never shuffle until the
    tiny manifest aggregate); hash sharding is uniform so no shard skew
    regardless of doc-id distribution."""
    from parquet_modular_encryption_spark.functions.text import hash60

    prep(spark)
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    epochs = spark.range(3).select(F.col("id").cast("int").alias("epoch"))
    assigned = docs.crossJoin(F.broadcast(epochs)).select(
        "doc_id",
        "n_chars",
        "epoch",
        (
            hash60(
                F.concat(
                    F.col("epoch").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            )
            % 8
        )
        .cast("int")
        .alias("shard"),
    )
    return assigned.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "q95c_scd2_point_in_time",
    oracle=f"""
    WITH changes AS (
        SELECT o_orderkey, o_totalprice, 0 AS version FROM orders
        UNION ALL
        SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, 1 AS version
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice * 1.2 AS o_totalprice, 2 AS version
        FROM orders WHERE o_orderkey % 21 = 0
    ), fact AS (
        SELECT l_orderkey, l_linenumber, CAST(l_linenumber % 3 AS INT) AS v
        FROM lineitem
    ), matched AS (
        SELECT f.l_orderkey, f.l_linenumber, f.v,
               MAX(h.version) AS matched_version,
               arg_max(h.o_totalprice, h.version) AS price
        FROM fact f
        JOIN changes h ON h.o_orderkey = f.l_orderkey AND h.version <= f.v
        GROUP BY f.l_orderkey, f.l_linenumber, f.v
    )
    SELECT CAST(v AS INT) AS version_queried,
           CAST(matched_version AS INT) AS matched_version,
           CAST(COUNT(*) AS BIGINT) AS n_facts,
           {sql_dsum("price")} AS sum_price
    FROM matched
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("cdc", "scd2", "temporal-join"),
)
def q95c_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join against the q110 SCD2 history — the
    correctness pattern every feature store / warehouse needs: each fact
    row (lineitem, tagged with an as-of version) must see the dimension
    row that was CURRENT at its time, never a later one (no lookahead
    leakage) and never an earlier one once superseded.

    Engine shape: equi-join on the dimension key with the validity
    predicate as a post-join filter, then ONE aggregation picking the
    max version <= as-of per fact row via a struct-max (map-side
    combinable argmax — no window over the joined stream). The fan-out of
    the equi-join is bounded by versions-per-key (<= 3 here; bounded by
    retention policy in production), so the PIT join costs one bounded
    join + one agg regardless of fact volume — the shape that survives a
    100 TB fact table, vs the naive BETWEEN range join whose planner
    fallback is a broadcast-nested-loop. Reuses q110's builder verbatim
    for the history side; the oracle replays the same change log with
    arg_max picking per-fact matches."""
    prep(spark)
    hist = q110_scd2_history(spark, sf_dir).select(
        "o_orderkey", "version", "o_totalprice"
    )
    li = load(spark, sf_dir, "lineitem")
    fact = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_linenumber") % 3).cast("int").alias("v"),
    )
    joined = fact.join(hist, fact.l_orderkey == hist.o_orderkey).filter(
        F.col("version") <= F.col("v")
    )
    picked = joined.groupBy("l_orderkey", "l_linenumber", "v").agg(
        F.max(F.struct(F.col("version"), F.col("o_totalprice"))).alias("b")
    )
    return (
        picked.groupBy(
            F.col("v").alias("version_queried"),
            F.col("b.version").cast("int").alias("matched_version"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            dsum(F.col("b.o_totalprice")).alias("sum_price"),
        )
        .orderBy("version_queried", "matched_version")
    )
