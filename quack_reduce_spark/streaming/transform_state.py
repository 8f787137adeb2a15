"""Custom stateful streaming via transformWithStateInPandas (the
Spark 4 arbitrary-state API superseding applyInPandasWithState).

Implements per-user anomaly flagging with typed state handles: a
ValueState carries (count, mean) in Welford form across micro-batches;
each incoming event is emitted with a flag when its value exceeds the
running mean by a fixed factor. This is the online-feature shape the
older API can't express cleanly — multiple typed state variables,
per-row emission (not one row per group per batch), and state TTL
support on a real cluster.

Requires the RocksDB state store provider (set in the caller's session
conf for streams; the operator itself is provider-agnostic) AND the
``protobuf`` package — transformWithState's state-server protocol is
protobuf-encoded. This container lacks protobuf, so the operator is
environment-gated: ``flag_anomalies`` raises a clear error when the
dependency is missing (tests skip); the applyInPandasWithState
operator in stateful.py is the dependency-free fallback with the same
state semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

FLAGGED_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("running_mean", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("mean", DoubleType())]
)

ANOMALY_FACTOR = 3.0


class AnomalyFlagger(StatefulProcessor):
    """Flags events whose value > ANOMALY_FACTOR x running user mean."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("mean_state", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            n, mean = self._state.get()
        else:
            n, mean = 0, 0.0
        out_vals, out_means, out_flags = [], [], []
        for batch in rows:
            # deterministic order inside the batch: by ts if present
            if "ts" in batch.columns:
                batch = batch.sort_values("ts")
            for v in batch["value"]:
                v = float(v)
                is_anom = n > 0 and v > ANOMALY_FACTOR * mean
                n += 1
                mean += (v - mean) / n
                out_vals.append(v)
                out_means.append(mean)
                out_flags.append(bool(is_anom))
        self._state.update((n, mean))
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)] * len(out_vals),
                "value": out_vals,
                "running_mean": out_means,
                "is_anomaly": out_flags,
            }
        )

    def close(self) -> None:
        pass


def flag_anomalies(events: DataFrame) -> DataFrame:
    """Per-user streaming anomaly flags (append mode). ``events`` must
    be a streaming DataFrame with (user_id, ts, value)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package for its "
            "state-server protocol; use streaming.stateful.running_user_stats "
            "(applyInPandasWithState) in environments without it"
        ) from e
    return events.groupBy("user_id").transformWithStateInPandas(
        AnomalyFlagger(),
        outputStructType=FLAGGED_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
