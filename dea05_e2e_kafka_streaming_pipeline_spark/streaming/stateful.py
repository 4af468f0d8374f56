"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming (SURVEY §2.8) — this is
north-star capability: arbitrary per-key state the built-in windowed
aggregates can't express. The pattern shipped here, a per-user running
profile (event count, value sum, last-seen timestamp) emitted on every
update, is the canonical shape; swap the update function for custom
semantics.

State is bounded per key (a fixed-width tuple), and the operator shuffles
once on the grouping key — the state store scales with |keys|, not
|events|, which is what makes it viable on an unbounded stream.

Note: checkpoint RESUME requires a recoverable sink (files or
``foreachBatch``); the memory sink used in tests/demos cannot recover —
drive multi-batch behavior there with ``maxFilesPerTrigger`` instead.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Per-user running profile over an event stream; emits the updated
    profile row for every user touched in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
