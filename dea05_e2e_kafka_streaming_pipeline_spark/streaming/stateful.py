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


# ---------------------------------------------------------------------------
# Streaming Kolmogorov–Smirnov drift — exact-integer ECDF state
# ---------------------------------------------------------------------------

KS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("n_ref", T.LongType()),
        T.StructField("d_num", T.LongType()),
        T.StructField("d_stat", T.DoubleType()),
        T.StructField("alert", T.BooleanType()),
    ]
)

KS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("vals_micro", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)

#: Bounded-state contract: the per-key KS state is the stream side's
#: per-distinct-value histogram (two parallel long arrays). Real-valued
#: features quantized to micros rarely exceed this within one
#: monitoring window; a feed that does needs a coarser quantization,
#: not a bigger buffer — the update raises rather than growing state
#: without bound.
KS_MAX_DISTINCT = 100_000


def ks_drift_stream(
    events: DataFrame,
    reference_micro: dict[str, tuple[list[int], list[int]]],
    threshold_d: float = 0.1,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming two-sample Kolmogorov–Smirnov drift monitor — the
    distribution-shape sibling of :func:`drift_monitor_stream` (which
    alerts on MEAN deviation only, blind to variance/shape changes
    that keep the mean: r4 verdict item 6). Per event type, the state
    is the stream's per-distinct-value histogram in exact integer
    micro-units, and each update emits the exact KS statistic against
    a FIXED offline reference ECDF (``reference_micro``: per type,
    sorted distinct micro values + their counts — broadcast with the
    closure like the mean monitor's baseline).

    Exactness contract: the statistic is the same integer arithmetic
    as the batch :func:`~..plans.analytics.ks_two_sample` — at every
    distinct value, |cum_s·tot_r − cum_r·tot_s| over the common
    denominator tot_s·tot_r — so the per-window output EQUALS the
    batch query run on the same (micro-quantized) data, and the
    histogram state is order-insensitive: any micro-batch boundary
    placement, restart, or replay yields the identical state
    (restart-tested). Alert when D > ``threshold_d``, decided on
    integers: d_num·10⁶ > thr_ppm·n_s·n_r — no float enters the
    decision.

    State per key is O(distinct stream values) capped at
    :data:`KS_MAX_DISTINCT`; the reference rides the closure, read-only.
    """
    if not 0 < threshold_d < 1:
        raise ValueError(f"threshold_d must be in (0,1): {threshold_d}")
    import math

    import numpy as np

    thr_ppm = int(round(threshold_d * 1_000_000))

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        et = key[0]
        if state.exists:
            vals, counts = state.get
            hist = dict(zip(vals, counts))
        else:
            hist = {}
        for pdf in pdfs:
            for v in pdf[value_col].dropna():
                mv = int(math.floor(float(v) * 1_000_000))
                hist[mv] = hist.get(mv, 0) + 1
        if len(hist) > KS_MAX_DISTINCT:
            raise ValueError(
                f"ks_drift_stream[{et}]: {len(hist)} distinct values "
                f"exceeds KS_MAX_DISTINCT={KS_MAX_DISTINCT}; quantize "
                "coarser instead of growing unbounded state"
            )
        vs = sorted(hist)
        cs = [hist[v] for v in vs]
        state.update((vs, cs))

        ref_v, ref_c = reference_micro.get(et, ([], []))
        sv = np.array(vs, dtype=np.int64)
        sc = np.cumsum(np.array(cs, dtype=np.int64))
        rv = np.array(ref_v, dtype=np.int64)
        rc = np.cumsum(np.array(ref_c, dtype=np.int64))
        tot_s = int(sc[-1]) if len(sc) else 0
        tot_r = int(rc[-1]) if len(rc) else 0
        if tot_s and tot_r:
            # evaluate both ECDF numerators at every distinct value of
            # the pooled support; python ints keep the products exact
            pooled = np.union1d(sv, rv)
            cum_s = sc[np.searchsorted(sv, pooled, side="right") - 1]
            cum_s = np.where(
                np.searchsorted(sv, pooled, side="right") > 0, cum_s, 0
            )
            cum_r = rc[np.searchsorted(rv, pooled, side="right") - 1]
            cum_r = np.where(
                np.searchsorted(rv, pooled, side="right") > 0, cum_r, 0
            )
            d_num = max(
                abs(int(a) * tot_r - int(b) * tot_s)
                for a, b in zip(cum_s, cum_r)
            )
        else:
            d_num = 0
        d_stat = (
            round(d_num / (tot_s * tot_r), 9) if tot_s and tot_r else 0.0
        )
        alert = bool(
            tot_s and tot_r and d_num * 1_000_000 > thr_ppm * tot_s * tot_r
        )
        yield pd.DataFrame(
            {
                "event_type": [et],
                "n_seen": [tot_s],
                "n_ref": [tot_r],
                "d_num": [d_num],
                "d_stat": [d_stat],
                "alert": [alert],
            }
        )

    return events.groupBy(type_col).applyInPandasWithState(
        update,
        outputStructType=KS_OUTPUT_SCHEMA,
        stateStructType=KS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ks_reference_from_df(
    df: "DataFrame", value_col: str = "value", type_col: str | None = None
) -> dict[str, tuple[list[int], list[int]]]:
    """Train the fixed reference for :func:`ks_drift_stream` offline:
    per type, sorted distinct micro-quantized values with counts (the
    exact ECDF, compressed to distinct-value grain). One aggregate at
    (type, value) grain; the result is sketch-sized and rides the
    monitor's closure."""
    cols = [type_col] if type_col else []
    grouped = (
        df.select(
            *cols,
            F.floor(F.col(value_col).cast("double") * 1_000_000)
            .cast("long")
            .alias("__mv"),
        )
        .filter(F.col("__mv").isNotNull())
        .groupBy(*cols, "__mv")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    out: dict[str, tuple[list[int], list[int]]] = {}
    for r in grouped:
        et = r[type_col] if type_col else ""
        vs, cs = out.setdefault(et, ([], []))
        vs.append(r["__mv"])
        cs.append(r["__c"])
    for et, (vs, cs) in out.items():
        order = sorted(range(len(vs)), key=vs.__getitem__)
        out[et] = ([vs[i] for i in order], [cs[i] for i in order])
    return out
