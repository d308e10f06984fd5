"""Storage-layout operators: partitioned datasets (partition pruning) and
bucketed tables (shuffle-free co-located joins).

At 100 TB, layout IS the query plan: directory partitioning turns
predicates into pruned file listings, and bucketing pre-pays the join
shuffle once at write time. q62 exercises the partitioned path end-to-end;
bucketing needs a metastore table, so it lives in tests/test_storage.py
(the driver's session should not be pointed at a scratch warehouse)."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.numeric import dsum, sql_dsum
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.scratch import scratch_dir
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
    scratch = scratch_dir("pme_q62_")
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


# ---------------------------------------------------------------------------
# Snapshot-versioned tables (Iceberg-lite): time travel + schema evolution
# ---------------------------------------------------------------------------
#
# A table directory holds immutable per-version data directories plus a
# single manifest.json naming, for every committed version, the list of
# data directories that make up that snapshot. Commits never mutate
# committed data; publishing is one atomic manifest swap (os.replace here;
# a conditional PUT of the metadata pointer on object storage — the same
# core protocol Iceberg/Delta use). Readers resolve the manifest once and
# then read immutable paths, so a concurrent commit can never tear a scan:
# time travel is just resolving an older version's dir list.


def _manifest_path(table_dir: str) -> str:
    import os

    return os.path.join(table_dir, "manifest.json")


def _read_manifest(table_dir: str) -> dict | None:
    import json
    import os

    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def snapshot_commit(df: DataFrame, table_dir: str, mode: str = "overwrite") -> int:
    """Commit ``df`` as the table's next version; returns the version id.

    ``overwrite`` starts a fresh snapshot (the new data dir alone);
    ``append`` extends the previous snapshot's dir list — appends with a
    wider schema are legal and surface via mergeSchema on read (schema
    evolution). Version data lands in v{N} (write fails rather than
    clobbers — dirs are immutable), then the manifest swap publishes it."""
    import json
    import os

    os.makedirs(table_dir, exist_ok=True)
    manifest = _read_manifest(table_dir) or {"current": 0, "versions": {}}
    version = manifest["current"] + 1
    rel = f"v{version:06d}"
    df.write.mode("errorifexists").parquet(os.path.join(table_dir, rel))
    prev_dirs = manifest["versions"].get(str(manifest["current"]), [])
    dirs = [rel] if mode == "overwrite" else [*prev_dirs, rel]
    manifest["versions"][str(version)] = dirs
    manifest["current"] = version
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(table_dir))  # atomic publish
    return version


def snapshot_read(
    spark: SparkSession, table_dir: str, as_of: int | None = None
) -> DataFrame:
    """Read a snapshot table at ``as_of`` (default: current version).
    mergeSchema unions the snapshot's data dirs even when appends widened
    the schema — earlier files surface the new columns as NULL."""
    import os

    manifest = _read_manifest(table_dir)
    if manifest is None or manifest["current"] == 0:
        raise FileNotFoundError(f"no committed snapshot at {table_dir}")
    version = manifest["current"] if as_of is None else as_of
    dirs = manifest["versions"].get(str(version))
    if dirs is None:
        raise KeyError(
            f"version {version} not in table (have {sorted(manifest['versions'])})"
        )
    paths = [os.path.join(table_dir, d) for d in dirs]
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def _status_agg(spark: SparkSession, sf_dir: str, max_year: int | None) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    if max_year is not None:
        orders = orders.filter(F.year("o_orderdate") <= max_year)
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("status_value"),
    )


@register(
    "q62b_snapshot_time_travel",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS status_value
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) <= 1996
    GROUP BY 1
    """,
    tags=("storage", "snapshot", "time-travel"),
)
def q62b_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel on a snapshot-versioned table: commit v1 (orders
    through 1996), overwrite-commit v2 (all years), then read AS OF v1.
    The oracle recomputes v1's content from the source table — a hash
    match proves the overwrite commit left the v1 snapshot untouched
    (immutable data dirs + atomic manifest swap)."""
    prep(spark)
    scratch = scratch_dir("pme_q62b_")
    table = f"{scratch}/status_table"
    snapshot_commit(_status_agg(spark, sf_dir, 1996), table)
    snapshot_commit(_status_agg(spark, sf_dir, None), table)
    return snapshot_read(spark, table, as_of=1)


@register(
    "q62c_schema_evolution_read",
    oracle=f"""
    WITH v1 AS (
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(NULL AS INTEGER) AS o_year
        FROM orders WHERE EXTRACT(year FROM o_orderdate) <= 1996
        GROUP BY o_orderstatus
    ), v2 AS (
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(1997 AS INTEGER) AS o_year
        FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
        GROUP BY o_orderstatus
    )
    SELECT * FROM v1 UNION ALL SELECT * FROM v2
    """,
    tags=("storage", "snapshot", "schema-evolution"),
)
def q62c_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution via append commits: v1 lacks the o_year column, an
    append commit adds files WITH it, and the mergeSchema read surfaces
    v1's rows with o_year NULL — no rewrite of committed data (the
    evolution path a 100 TB table needs; rewriting history at that scale
    is not an option)."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    scratch = scratch_dir("pme_q62c_")
    table = f"{scratch}/evolving_table"
    v1 = (
        orders.filter(F.year("o_orderdate") <= 1996)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    snapshot_commit(v1, table)
    v2 = (
        orders.filter(F.year("o_orderdate") == 1997)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("o_year", F.lit(1997).cast("int"))
    )
    snapshot_commit(v2, table, mode="append")
    return snapshot_read(spark, table)


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


def merge_commit(
    spark: SparkSession, table_dir: str, source: DataFrame, key_cols: list[str]
) -> int:
    """MERGE INTO (upsert) as a new snapshot version: source rows replace
    target rows with the same key; unmatched target rows carry over.

    Copy-on-write at snapshot granularity — the simplest correct form,
    and time travel keeps working because the pre-merge version remains
    readable. At 100 TB the rewrite would be scoped to the partitions the
    source touches (per-partition copy-on-write) or deferred entirely
    (merge-on-read: write source as a delta file list and resolve
    latest-wins per key at scan time — the q95/read_upsert_dir pattern);
    the commit protocol is identical in all three forms. The anti-join
    keys on ``key_cols`` — one shuffle of the target, with the source key
    set broadcast when small (AQE decides)."""
    target = snapshot_read(spark, table_dir)
    remaining = target.join(source.select(*key_cols), key_cols, "left_anti")
    merged = remaining.unionByName(source, allowMissingColumns=True)
    return snapshot_commit(merged, table_dir, mode="overwrite")


@register(
    "q62d_snapshot_merge_upsert",
    oracle="""
    WITH v1 AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) * 10000 AS BIGINT) AS value_e4
        FROM orders WHERE EXTRACT(year FROM o_orderdate) <= 1996
        GROUP BY o_custkey
    ), src AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) * 10000 AS BIGINT) AS value_e4
        FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
        GROUP BY o_custkey
    )
    SELECT * FROM src
    UNION ALL
    SELECT v1.* FROM v1 LEFT JOIN src USING (o_custkey) WHERE src.o_custkey IS NULL
    """,
    tags=("storage", "snapshot", "merge", "upsert"),
)
def q62d_snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on a snapshot table: v1 holds per-customer order stats
    through 1996; the merge source holds 1997 stats. Matched customers are
    replaced by the source row, unmatched v1 customers survive — the
    upsert contract, hash-checked against the UNION ALL + anti-join
    formulation in SQL. Sums travel as scale-4 integer cents-of-cents
    (exact in both engines)."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")

    def per_cust(filtered: DataFrame) -> DataFrame:
        return filtered.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast("decimal(38,10)")) * 10000)
            .cast("bigint")
            .alias("value_e4"),
        )

    scratch = scratch_dir("pme_q62d_")
    table = f"{scratch}/cust_stats"
    snapshot_commit(per_cust(orders.filter(F.year("o_orderdate") <= 1996)), table)
    merge_commit(
        spark,
        table,
        per_cust(orders.filter(F.year("o_orderdate") == 1997)),
        ["o_custkey"],
    )
    return snapshot_read(spark, table)


def morton_code(a: "F.Column", b: "F.Column", bits: int = 16) -> "F.Column":
    """Interleave the low ``bits`` bits of two non-negative ints into a
    Morton (Z-order) code. Pure JVM bit ops inside whole-stage codegen —
    no UDF."""
    from functools import reduce

    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_layout(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Two-dimensional Z-order clustering: min-max-normalize both columns
    onto a 2^bits grid, interleave into a Morton code, and range-cluster
    the write on it. Each output file then covers a small rectangle in
    (col_a, col_b) space, so row-group min/max statistics prune scans on
    EITHER column's range predicate — the property single-column sorting
    (sorted_layout) can only give one dimension. This is how 100 TB fact
    tables serve two independent access patterns (e.g. by time AND by
    key) from one layout. The min/max pre-scan is one cheap agg (2 values
    to the driver — bounded)."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    scale = (1 << bits) - 1

    def norm(c: str, lo, hi) -> "F.Column":
        rng = max(hi - lo, 1)
        return ((F.col(c) - F.lit(lo)) * scale / F.lit(rng)).cast("bigint")

    code = morton_code(norm(col_a, lo_a, hi_a), norm(col_b, lo_b, hi_b), bits)
    (
        df.withColumn("__z", code)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
