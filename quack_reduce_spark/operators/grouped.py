"""Grouped-map operators via applyInPandas (north-star pattern).

For per-group algorithms that genuinely exceed SQL semantics —
order-dependent state machines, iterative math — the Spark-idiomatic
home is ``groupBy().applyInPandas``: Arrow-batched, one pandas frame
per group, output schema explicit. Used sparingly: anything a window
function can express stays JVM-side (see inventory modules).

``event_transitions`` is the canonical example: per-user first-order
Markov transition counts over the time-ordered event sequence. (A
window-lag equivalent exists and is used as the test oracle — the
applyInPandas version is the template for the cases where no such
equivalent exists.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

TRANSITION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("n", LongType()),
    ]
)


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user (from_event_type -> to_event_type) counts in ts order.

    Groups are single users — bounded size; ordering happens inside the
    pandas frame (Spark does not guarantee group order)."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        frm = pdf["event_type"].iloc[:-1].to_numpy()
        to = pdf["event_type"].iloc[1:].to_numpy()
        if len(frm) == 0:
            return pd.DataFrame(columns=["user_id", "from_type", "to_type", "n"])
        out = (
            pd.DataFrame({"from_type": frm, "to_type": to})
            .value_counts()
            .reset_index(name="n")
        )
        out.insert(0, "user_id", pdf["user_id"].iloc[0])
        return out

    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandas(per_user, TRANSITION_SCHEMA)
    )
