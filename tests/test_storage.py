"""Storage-layout tests: partition pruning reaches the file listing, and
bucketed tables join without an exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_modular_encryption_spark.operators.storage import (
    q62_partition_pruning,
    write_partitioned,
)
from parquet_modular_encryption_spark.plans.explain import executed_plan

SF = "/root/testdata/sf0.001"


def test_partition_pruning_in_plan(spark, tmp_path):
    path = str(tmp_path / "orders_by_year")
    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_partitioned(orders, path, ["order_year"])
    df = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    plan = executed_plan(df)
    assert "PartitionFilters" in plan and "order_year" in plan
    # the pruned scan must not read the partition column from data files
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "1997" in m.group(1), plan[:800]


def test_partitioned_roundtrip_counts(spark, tmp_path):
    path = str(tmp_path / "orders_part")
    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_partitioned(orders, path, ["order_year"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    got = {r.order_year: r.n for r in back.groupBy("order_year").agg(F.count("*").alias("n")).collect()}
    want = {r.order_year: r.n for r in orders.groupBy("order_year").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """bucketBy pre-pays the join shuffle at write time: a join of two
    tables bucketed on the same key by the same count needs no Exchange."""
    # spark.sql.warehouse.dir is static — tables land in ./spark-warehouse
    # (gitignored) and are dropped in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy(
            "o_orderkey"
        ).saveAsTable("orders_b")
        lineitem.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy(
            "l_orderkey"
        ).saveAsTable("lineitem_b")
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        n = joined.count()
        assert n == lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        plan = executed_plan(joined)
        assert "Exchange" not in plan, plan[:1200]
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_q62_runs(spark):
    rows = q62_partition_pruning(spark, SF).collect()
    assert len(rows) > 0


def test_compaction_shrinks_files_preserves_data(spark, tmp_path):
    from parquet_modular_encryption_spark.operators.storage import compact

    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.repartition(64).write.parquet(src)  # simulate small-file buildup
    import os

    n_in = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    n_out = compact(spark, src, out, target_file_bytes=4 * 1024 * 1024)
    assert n_out < n_in / 4, f"{n_in} -> {n_out}"
    a = spark.read.parquet(src).orderBy("l_orderkey", "l_linenumber").collect()
    b = spark.read.parquet(out).orderBy("l_orderkey", "l_linenumber").collect()
    assert a == b


def test_schema_evolution_merge(spark, tmp_path):
    """Appending files with a widened schema must read back as the merged
    superset with nulls for the missing column (mergeSchema)."""
    p = str(tmp_path / "evolving")
    v1 = spark.range(3).selectExpr("id", "id * 2 AS a")
    v1.write.parquet(p)
    v2 = spark.range(3, 6).selectExpr("id", "id * 2 AS a", "id * 10 AS b")
    v2.write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in merged.collect()}
    assert rows[0] == (0, None) and rows[5] == (10, 50)


def test_sorted_layout_rowgroup_stats(spark, tmp_path):
    """Range-clustered layout: each file's l_orderkey span must be a small
    slice of the global span (that's what makes min/max skipping work)."""
    import os

    import pyarrow.parquet as pq

    from parquet_modular_encryption_spark.operators.storage import sorted_layout

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    p = str(tmp_path / "clustered")
    sorted_layout(li, p, ["l_orderkey"], n_files=8)
    lo, hi = li.selectExpr("min(l_orderkey)", "max(l_orderkey)").first()
    spans = []
    for f in os.listdir(p):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(p, f)).metadata
        idx = md.schema.names.index("l_orderkey")
        fmin = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        fmax = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((fmax - fmin) / (hi - lo))
    assert len(spans) >= 4
    assert sorted(spans)[len(spans) // 2] < 0.3, f"median file span too wide: {spans}"


def test_snapshot_table_time_travel_and_atomicity(spark, tmp_path):
    """Snapshot table contract: as-of reads return each committed version
    exactly; an overwrite commit never mutates prior versions; append
    commits evolve schema without rewriting history; the manifest swap
    leaves no temp file behind; unknown versions raise."""
    import os

    import pytest as _pytest

    from parquet_modular_encryption_spark.operators.storage import (
        snapshot_commit,
        snapshot_read,
    )

    table = str(tmp_path / "snap")
    v1 = snapshot_commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string"), table
    )
    # resolve v1 BEFORE further commits: immutability check below
    before = sorted(map(tuple, snapshot_read(spark, table, as_of=v1).collect()))

    v2 = snapshot_commit(
        spark.createDataFrame([(3, "c")], "id bigint, s string"), table
    )
    v3 = snapshot_commit(
        spark.createDataFrame([(4, "d", 9.5)], "id bigint, s string, score double"),
        table,
        mode="append",
    )
    assert (v1, v2, v3) == (1, 2, 3)

    assert sorted(map(tuple, snapshot_read(spark, table, as_of=1).collect())) == [
        (1, "a"),
        (2, "b"),
    ]
    assert before == [(1, "a"), (2, "b")]  # untouched by later commits
    assert sorted(map(tuple, snapshot_read(spark, table, as_of=2).collect())) == [
        (3, "c")
    ]
    latest = snapshot_read(spark, table)
    assert set(latest.columns) == {"id", "s", "score"}
    got = sorted(map(tuple, latest.select("id", "s", "score").collect()))
    assert got == [(3, "c", None), (4, "d", 9.5)]

    assert not os.path.exists(f"{table}/manifest.json.tmp")
    with _pytest.raises(KeyError):
        snapshot_read(spark, table, as_of=99)
    with _pytest.raises(FileNotFoundError):
        snapshot_read(spark, str(tmp_path / "missing"))


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """Z-order layout must bound per-file value spans on BOTH columns;
    single-column sorting leaves the second dimension unclustered (span
    ~1.0 of the range), which is the gap Z-order closes."""
    import os

    import pyarrow.parquet as pq

    from parquet_modular_encryption_spark.operators.storage import (
        sorted_layout,
        zorder_layout,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zp = str(tmp_path / "zorder")
    sp = str(tmp_path / "single")
    zorder_layout(li, zp, "l_orderkey", "l_partkey", n_files=16)
    sorted_layout(li, sp, ["l_orderkey"], n_files=16)

    bounds = {
        c: (v0, v1)
        for c, v0, v1 in [
            ("l_orderkey", *li.selectExpr("min(l_orderkey)", "max(l_orderkey)").first()),
            ("l_partkey", *li.selectExpr("min(l_partkey)", "max(l_partkey)").first()),
        ]
    }

    def file_spans(path, col):
        lo, hi = bounds[col]
        spans = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.names.index(col)
            fmin = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            fmax = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append((fmax - fmin) / (hi - lo))
        return sorted(spans)

    def median(xs):
        return xs[len(xs) // 2]

    z_a, z_b = file_spans(zp, "l_orderkey"), file_spans(zp, "l_partkey")
    s_b = file_spans(sp, "l_partkey")
    # both dims clustered under Z-order...
    assert median(z_a) < 0.7, f"zorder l_orderkey spans: {z_a}"
    assert median(z_b) < 0.7, f"zorder l_partkey spans: {z_b}"
    # ...whereas single-column sort leaves the second dim unclustered
    assert median(s_b) > 0.9, f"single-sort l_partkey spans: {s_b}"
    assert median(z_b) < median(s_b)
