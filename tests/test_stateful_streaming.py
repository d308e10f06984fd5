"""applyInPandasWithState: running per-user profiles must converge to the
batch aggregate when the stream is exhausted."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_modular_encryption_spark.streaming.stateful import user_profiles
from parquet_modular_encryption_spark.streaming.windows import stream_events

SF = "/root/testdata/sf0.001"


def test_user_profiles_match_batch(spark):
    stream = stream_events(spark, SF)
    q = (
        user_profiles(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_profiles")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode re-emits a key on every batch it appears in; the LAST
    # emission per key is the final state
    got = (
        spark.table("t_profiles")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_ts_us").alias("last_ts_us"),
        )
    )
    from parquet_modular_encryption_spark.sources.datasets import load

    batch = (
        load(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.max("ts")).alias("last_ts_us"),
        )
    )
    g = {r.user_id: (r.n_events, r.last_ts_us) for r in got.collect()}
    b = {r.user_id: (r.n_events, r.last_ts_us) for r in batch.collect()}
    assert g == b


def test_transform_with_state_matches_applyinpandas(spark):
    """The Spark 4 transformWithState profile operator must converge to
    the same final per-user state as the applyInPandasWithState one
    (and hence the batch aggregate)."""
    import pytest as _pytest

    from parquet_modular_encryption_spark.streaming.stateful import (
        HAS_TRANSFORM_WITH_STATE,
        TWS_PROBE,
        user_profiles_tws,
    )

    if not HAS_TRANSFORM_WITH_STATE:
        # the probe string names the exact missing component, so this
        # un-gates itself (and says why it didn't) on env upgrades
        _pytest.skip(f"transformWithState capability probe: {TWS_PROBE}")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = stream_events(spark, SF)
        q = (
            user_profiles_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("t_profiles_tws")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = (
            spark.table("t_profiles_tws")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("last_ts_us").alias("last_ts_us"),
            )
        )
        from parquet_modular_encryption_spark.sources.datasets import load

        batch = (
            load(spark, SF, "events")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.unix_micros(F.max("ts")).alias("last_ts_us"),
            )
        )
        g = {r.user_id: (r.n_events, r.last_ts_us) for r in got.collect()}
        b = {r.user_id: (r.n_events, r.last_ts_us) for r in batch.collect()}
        assert g == b
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_tws_unavailable_raises_capability_error(spark):
    """When the capability probe fails, user_profiles_tws must raise a
    RuntimeError naming the missing dependency — not leak a NameError
    from the undefined processor class (ADVICE r6)."""
    import pytest as _pytest

    from parquet_modular_encryption_spark.streaming import stateful
    from parquet_modular_encryption_spark.streaming.windows import stream_events

    if stateful.HAS_TRANSFORM_WITH_STATE:
        _pytest.skip(f"capability present ({stateful.TWS_PROBE}); guard not reachable")
    stream = stream_events(spark, SF)
    with _pytest.raises(RuntimeError, match="transformWithStateInPandas unavailable"):
        stateful.user_profiles_tws(stream)
