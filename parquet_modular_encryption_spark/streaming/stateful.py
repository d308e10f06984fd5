"""Custom stateful streaming operators via applyInPandasWithState.

The streaming escape hatch for semantics watermarked windows can't
express: arbitrary per-key state evolved batch-by-batch. The example
operator keeps a running per-user profile (event count, value sum, last
event time) and emits the updated profile every time the key appears in a
micro-batch — the building block for online feature stores and
anomaly counters.

Scale notes: state lives in the state store keyed by user_id, sharded by
shuffle partitions; a timeout (here processing-time) bounds orphaned keys.
Each group's per-batch rows arrive as pandas frames via Arrow."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, last_ts_us bigint"
)
STATE_SCHEMA = "n bigint, total double, last_us bigint"


def _update_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts_us": [last_us],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Running per-user profiles over an event stream (update mode)."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    ).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithState: the successor API to applyInPandasWithState —
# typed composable state (ValueState/ListState/MapState), timers, and TTL,
# executed against the RocksDB state store (changelog-checkpointable, the
# 100 TB-state path). Same running-profile semantics as user_profiles so
# the two APIs are cross-checked by one test.
# ---------------------------------------------------------------------------

# Capability probe, recorded component-by-component so the skip reason in
# CI names exactly what is missing (and the suite un-gates itself the
# moment the environment upgrades): transformWithState needs Spark >= 4.0
# AND google.protobuf (the state-server wire protocol; this container
# ships pyspark without it).
import pyspark as _pyspark

_SPARK_TWS_OK = tuple(int(x) for x in _pyspark.__version__.split(".")[:2]) >= (4, 0)
try:
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _PROTOBUF_OK = True
except ImportError:
    _PROTOBUF_OK = False

TWS_PROBE = (
    f"pyspark={_pyspark.__version__} "
    f"({'>=4.0 OK' if _SPARK_TWS_OK else 'needs >= 4.0'}); "
    f"google.protobuf={'present' if _PROTOBUF_OK else 'MISSING'}"
)

try:
    if not (_SPARK_TWS_OK and _PROTOBUF_OK):
        raise ImportError(TWS_PROBE)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("profile", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n, total, last_us = (
                self._state.get() if self._state.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                last_us = max(last_us, int(pdf["ts_us"].max()))
            self._state.update((n, float(total), last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_ts_us": [last_us],
                }
            )

        def close(self) -> None:
            pass

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover - older Spark
    HAS_TRANSFORM_WITH_STATE = False


def user_profiles_tws(events: DataFrame) -> DataFrame:
    """user_profiles on the Spark 4 transformWithStateInPandas API.

    Requires the RocksDB state store provider (set by the caller/test via
    ``spark.sql.streaming.stateStore.providerClass``) — the HDFS-backed
    default store does not support transformWithState — and the protobuf
    package (see HAS_TRANSFORM_WITH_STATE). RocksDB is also
    the right answer at scale: state spills to local SSD instead of
    executor heap, and changelog checkpointing bounds commit latency."""
    if not HAS_TRANSFORM_WITH_STATE:
        raise RuntimeError(
            f"transformWithStateInPandas unavailable: {TWS_PROBE} — "
            "use user_profiles (applyInPandasWithState) instead"
        )
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    ).groupBy("user_id")
    return keyed.transformWithStateInPandas(
        statefulProcessor=_ProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
