"""Custom stateful streaming operator via applyInPandasWithState.

The north-star requires arbitrary stateful operators beyond built-in
windows (BASELINE.json; the reference has no streaming at all). This
module implements a running per-user activity accumulator: for each
user, maintain (n_events, total_value, last_ts) across micro-batches,
emitting the updated row per batch — the building block for
online feature stores / per-entity counters at 100 TB/day.

State is keyed by user_id (hash-partitioned by Spark's streaming state
store); each group's state is a single small tuple, so state size is
O(distinct users), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _update_user_stats(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import datetime as dt

    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for batch in batches:
        n += len(batch)
        total += float(batch["value"].sum())
        batch_max = batch["ts"].max()
        last_us = max(last_us, int(batch_max.value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [dt.datetime.utcfromtimestamp(last_us / 1_000_000)],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user accumulator (update mode). ``events`` must be
    a streaming DataFrame with (user_id, ts, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
