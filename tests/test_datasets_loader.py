"""Loader robustness: the driver has regenerated events.parquet with a
different ts encoding twice (TIMESTAMP(NANOS) in rounds 1-4, timestamp[us]/
NTZ in round 5 — which broke 8 queries and crashed the bench). Pin the
contract here: whatever encoding lands on disk, ``datasets.load`` must
surface ``ts`` as TimestampType (µs, UTC session) with the correct
epoch-µs values, so every ``unix_micros`` call site downstream keeps
working."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_modular_encryption_spark.sources.datasets import (
    load,
    normalize_event_ts,
)

ROWS = [
    (1, datetime.datetime(2024, 1, 1, 12, 0, 0), 10),
    (2, datetime.datetime(2024, 6, 15, 3, 30, 45, 123456), 11),
]
EPOCH_US = [
    int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    for _, ts, _ in ROWS
]


def _write_fixture(path: str, ts_type: pa.DataType) -> None:
    ids = pa.array([r[0] for r in ROWS], pa.int64())
    users = pa.array([r[2] for r in ROWS], pa.int64())
    if pa.types.is_integer(ts_type):
        ts = pa.array(EPOCH_US, ts_type)  # raw int64 epoch-µs
        tbl = pa.table({"event_id": ids, "ts": ts, "user_id": users})
    else:
        ts = pa.array([r[1] for r in ROWS], ts_type)
        tbl = pa.table({"event_id": ids, "ts": ts, "user_id": users})
    pq.write_table(tbl, path)


@pytest.mark.parametrize(
    "ts_type",
    [
        pa.timestamp("us"),  # round-5 encoding → Spark TIMESTAMP_NTZ
        pa.timestamp("us", tz="UTC"),  # plain TIMESTAMP
        pa.timestamp("ns"),  # rounds 1-4 → BIGINT via nanosAsLong conf
        pa.int64(),  # hypothetical future: raw epoch-µs int64
    ],
    ids=["ntz_us", "tz_us", "nanos", "int64_us"],
)
def test_events_ts_normalized_any_encoding(spark, tmp_path, ts_type):
    sf_dir = str(tmp_path / f"sf_{ts_type!s}".replace("[", "_").replace("]", "_"))
    import os

    os.makedirs(sf_dir, exist_ok=True)
    _write_fixture(f"{sf_dir}/events.parquet", ts_type)

    df = load(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"ts must be TimestampType, got {df.schema['ts'].dataType}"
    )
    got = {
        r.event_id: r.us
        for r in df.select("event_id", F.unix_micros("ts").alias("us")).collect()
    }
    want = {r[0]: us for r, us in zip(ROWS, EPOCH_US)}
    assert got == want


def test_normalize_is_noop_on_timestamp(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "event_id bigint, ts timestamp"
    )
    out = normalize_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.collect() == df.collect()


def test_real_testdata_events_loads(spark, sf_dir):
    """Whatever the driver shipped THIS round must load and unix_micros."""
    df = load(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    n = df.select(F.unix_micros("ts")).filter(F.col("unix_micros(ts)").isNotNull()).count()
    assert n > 0


# ---------------------------------------------------------------------------
# Spark 4 Python Data Source (sources/python_datasource.py)
# ---------------------------------------------------------------------------


def test_python_datasource_partition_parallelism(spark, sf_dir):
    """One shard file = one InputPartition = one task: the custom source
    must fan out across shards, not funnel through a single reader."""
    import glob

    from parquet_modular_encryption_spark.sources.python_datasource import (
        JsonlDataSource,
        jsonl_fixture,
    )

    path = jsonl_fixture(spark, sf_dir)
    n_shards = len(glob.glob(f"{path}/*.json"))
    assert n_shards > 1
    spark.dataSource.register(JsonlDataSource)
    df = spark.read.format("pme_jsonl").option("path", path).load()
    assert df.rdd.getNumPartitions() == n_shards


def test_python_datasource_nulls_unicode_missing_fields(spark, tmp_path):
    """Hand-written JSONL with unicode, an explicit null, a missing field,
    and a blank line: cells must round-trip exactly like Spark's own JSON
    reader semantics (missing key -> NULL)."""
    import json

    from parquet_modular_encryption_spark.sources.python_datasource import (
        JsonlDataSource,
    )

    shard = tmp_path / "part-0.json"
    rows = [
        {"doc_id": 1, "text": "héllo wörld é中文", "lang": "de", "source": "web", "n_chars": 12},
        {"doc_id": 2, "text": None, "lang": "en", "source": "web", "n_chars": 0},
        {"doc_id": 3, "text": "plain", "lang": "en", "n_chars": 5},  # source missing
    ]
    shard.write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n\n", encoding="utf-8"
    )
    spark.dataSource.register(JsonlDataSource)
    got = {
        r.doc_id: r
        for r in spark.read.format("pme_jsonl")
        .option("path", str(tmp_path))
        .load()
        .collect()
    }
    assert len(got) == 3
    assert got[1].text == "héllo wörld é中文"
    assert got[2].text is None
    assert got[3].source is None and got[3].n_chars == 5


def test_python_datasource_reregister_and_rerun(spark, sf_dir):
    """bench runs every query 3x in one session: registering the source
    again and re-running the builder must work and agree with itself."""
    from parquet_modular_encryption_spark.sources.python_datasource import (
        q39b_python_datasource,
    )

    a = sorted(map(tuple, q39b_python_datasource(spark, sf_dir).collect()))
    b = sorted(map(tuple, q39b_python_datasource(spark, sf_dir).collect()))
    assert a == b and len(a) > 0
