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
from pyspark.sql import functions as F
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


def funnel_stream(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming ordered-progression funnel — the stateful twin of
    ``operators.sessionize.event_funnel``: per user, the earliest
    strictly-increasing completion time of each step, updated as events
    arrive and emitted for every user touched in a micro-batch.

    State per key is ``len(steps)`` microsecond timestamps (fixed-width
    — the store scales with |users|, never |events|). Each micro-batch
    sorts its own rows by event time and advances the same greedy fold
    the batch operator runs; because completed slots are monotone (a
    slot, once set, never moves), in-order delivery reproduces the
    batch result EXACTLY (asserted in tests). An event arriving LATE —
    after a later-timestamped event already advanced the next slot —
    cannot retroactively improve earlier slots; that is the standard
    streaming-vs-batch divergence for out-of-order input, and the
    checkpoint keeps whatever the stream actually saw.

    Emitted rows mirror the batch operator's columns (``<step>_ts``,
    ``stage_reached``); users that have not reached step 1 emit
    nothing.
    """
    if len(steps) < 2:
        raise ValueError("funnel_stream needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_stream steps must be distinct event types")
    k = len(steps)
    out_schema = T.StructType(
        [T.StructField(user_col, T.LongType())]
        + [T.StructField(f"{s}_ts", T.TimestampType()) for s in steps]
        + [T.StructField("stage_reached", T.IntegerType())]
    )
    state_schema = T.StructType(
        [T.StructField(f"s{i}_us", T.LongType()) for i in range(k)]
    )

    def update(key, pdfs, state):
        slots = list(state.get) if state.exists else [None] * k
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts_col)
        for _, r in rows.iterrows():
            ts_us = int(pd.Timestamp(r[ts_col]).value // 1000)
            tp = r[type_col]
            for i, step in enumerate(steps):
                if slots[i] is None and tp == step:
                    if i == 0 or (
                        slots[i - 1] is not None and ts_us > slots[i - 1]
                    ):
                        slots[i] = ts_us
                    break
        state.update(tuple(slots))
        if slots[0] is None:
            return iter(())
        out = {user_col: [key[0]]}
        reached = 0
        for i, s in enumerate(steps):
            out[f"{s}_ts"] = [
                pd.Timestamp(slots[i], unit="us") if slots[i] is not None else pd.NaT
            ]
            reached += slots[i] is not None
        out["stage_reached"] = [reached]
        return iter((pd.DataFrame(out),))

    return (
        events.filter(F.col(type_col).isin(*steps))
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 StatefulProcessor API)
# ---------------------------------------------------------------------------

VISIT_OUTPUT_SCHEMA = (
    "user_id long, n_events long, n_batches int, first_seen_batch int"
)


from pyspark.sql.streaming import StatefulProcessor


class VisitCountProcessor(StatefulProcessor):
    """Per-user visit counter on the Spark 4 ``StatefulProcessor`` API
    (``transformWithStateInPandas``) — the successor to
    ``applyInPandasWithState`` with typed state handles, composable
    state variables, and (on supported state stores) per-state TTL.

    Maintains ValueState ``(n_events, n_batches, first_seen_batch)``
    per user and emits the running totals every time the user appears
    in a micro-batch. State is one fixed-width row per key — the store
    scales with |users|, not |events|."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (
            IntegerType,
            LongType,
            StructField,
            StructType,
        )

        self._handle = handle
        self.state = handle.getValueState(
            "visit",
            StructType(
                [
                    StructField("n_events", LongType()),
                    StructField("n_batches", IntegerType()),
                    StructField("first_seen_batch", IntegerType()),
                ]
            ),
        )
        self.batch_no = 0

    def handleInputRows(self, key, rows, timerValues) -> "Iterator[pd.DataFrame]":
        n_new = 0
        for pdf in rows:
            n_new += len(pdf)
        if self.state.exists():
            n_events, n_batches, first_seen = self.state.get()
        else:
            n_events, n_batches, first_seen = 0, 0, -1
        n_events += n_new
        n_batches += 1
        if first_seen < 0:
            first_seen = n_batches  # 1-based batch ordinal for this key
        self.state.update((n_events, n_batches, first_seen))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_batches": [n_batches],
                "first_seen_batch": [first_seen],
            }
        )

    def close(self) -> None:
        pass


def visit_count_stream(events: DataFrame) -> DataFrame:
    """Per-user running visit counts via the Spark 4 StatefulProcessor
    API. One shuffle on user_id; emits an updated row per (user, batch)
    in Update mode.

    Environment-gated like the Delta/Avro jar paths: the
    ``transformWithState`` protocol needs the ``protobuf`` Python
    package (its state server speaks protobuf to the JVM) and the
    RocksDB state store; absent protobuf the query would die at start
    with an opaque "driver worker crashed" — raise the actionable
    error here instead. ``applyInPandasWithState`` operators
    (:func:`user_profile_stream`, :func:`funnel_stream`) cover
    custom state without this dependency."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' Python "
            "package (pip install protobuf) — its state-server protocol "
            "is protobuf-encoded; use the applyInPandasWithState "
            "operators on environments without it"
        ) from exc

    proc = VisitCountProcessor()
    return (
        events.select("user_id", "event_id")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=VISIT_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


DRIFT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("cum_dev_micro", T.LongType()),
        T.StructField("mean_dev_micro", T.LongType()),
        T.StructField("alert", T.BooleanType()),
    ]
)

DRIFT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType()),
        T.StructField("cum_dev_micro", T.LongType()),
    ]
)


def drift_monitor_stream(
    events: DataFrame,
    baseline_micro: dict[str, int],
    threshold_micro: int,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming mean-drift monitor — the stateful twin of the batch
    `cusum_changepoint_daily` operator: per event type, an exact
    integer accumulator of deviations from a FIXED baseline mean
    (trained offline, passed as micro-units), alerting when the mean
    deviation |Σdev|/n exceeds ``threshold_micro``. This is the
    model/data-drift tripwire that pages before a bad feed poisons a
    day of downstream training data.

    Determinism discipline: values floor-scale to integer micros, so
    the state (n, Σdev) is order-insensitive and batching-invariant —
    any micro-batch boundary placement, restart, or replay yields the
    IDENTICAL final state (restart-tested). A running-max CUSUM peak
    is deliberately NOT kept: the path maximum depends on arrival
    order, which would break exactly-once replay equivalence; the
    mean-deviation alert is order-free and is what an on-call rotation
    actually pages on. State per key is two longs — the store scales
    with |event types|, never |events|.
    """
    if threshold_micro <= 0:
        raise ValueError(f"threshold_micro must be positive: {threshold_micro}")
    import math

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        et = key[0]
        base = int(baseline_micro.get(et, 0))
        n, cum = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += len(vals)
            cum += int(
                sum(int(math.floor(float(v) * 1_000_000)) - base for v in vals)
            )
        state.update((n, cum))
        mean_dev = cum // n if n else 0
        yield pd.DataFrame(
            {
                "event_type": [et],
                "n_seen": [n],
                "cum_dev_micro": [cum],
                "mean_dev_micro": [mean_dev],
                "alert": [abs(cum) > threshold_micro * n],
            }
        )

    return events.groupBy(type_col).applyInPandasWithState(
        update,
        outputStructType=DRIFT_OUTPUT_SCHEMA,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
