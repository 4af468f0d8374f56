"""Sessionization — gap-based session assignment over an event stream.

Beyond reference parity (the reference imports ``Window``/``row_number``
but never uses them — ``enriched/custome_lifetime_value.py:1-2``, SURVEY
§2.5); this ships the analytic-window capability that import gestured at,
in the canonical form a clickstream pipeline needs.

Two implementations with identical semantics:

- batch: ``lag`` + conditional cumulative sum over a per-user window
  (one shuffle on ``user_id``; both window specs share the same
  partitioning, so Catalyst plans a single Exchange + Sort).
- streaming: ``F.session_window(ts, gap)`` grouping (state-store backed,
  watermark-bounded) — see streaming/pipeline.py.

Ties on ``ts`` are broken by the id column so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-user ``session_seq`` (1-based) to every event: a new
    session starts when the gap since the previous event exceeds
    ``gap_seconds``. Gap comparison is in exact integer microseconds."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(F.col(ts_col)).over(w)
    )
    new_sess = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_summary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user session counts: (user_id, n_sessions, n_events)."""
    s = sessionize(df, user_col, ts_col, id_col, gap_seconds)
    return s.groupBy(user_col).agg(
        F.max("session_seq").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def event_funnel(
    df: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-progression funnel (view → click → purchase): per user,
    the earliest strictly-increasing completion time of each step — the
    MATCH_RECOGNIZE-class sequence analytic Spark has no native operator
    for, built as ONE hash aggregate.

    Semantics are the standard greedy funnel: step 1 completes at the
    user's first step-1 event; step i at the first step-i event STRICTLY
    after step i-1's completion (equal timestamps never chain). Greedy
    earliest-first is completion-maximal, so this matches the
    min-then-min join formulation exactly (the DuckDB oracle in
    queries.py uses that formulation — different plan, same rows).

    Shape for 100 TB: the scan filters to the step event types
    (pushed), then a single groupBy(user) collects (ts, type) pairs —
    the per-user payload is bounded by that user's step events, and the
    sort + left-fold run inside the aggregate's projection, not as a
    window or self-join chain. One shuffle total; the k-step fold is a
    codegen array expression, no Python. Users with no step-1 event are
    dropped (they are not IN the funnel).

    Output: ``user_col``, one ``<step>_ts`` per step (NULL once the
    progression stops), ``stage_reached`` (1-based count of completed
    steps).
    """
    if len(steps) < 2:
        raise ValueError("event_funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("event_funnel steps must be distinct event types")
    k = len(steps)
    events = (
        df.filter(F.col(type_col).isin(*steps))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                        F.col(type_col).alias("tp")))
            ).alias("__evs")
        )
    )
    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def fold(acc, e):
        slots = []
        for i, step in enumerate(steps):
            prev_ok = (
                F.lit(True)
                if i == 0
                else acc[i - 1].isNotNull() & (e["ts"] > acc[i - 1])
            )
            slots.append(
                F.when(acc[i].isNotNull(), acc[i]).otherwise(
                    F.when((e["tp"] == step) & prev_ok, e["ts"])
                )
            )
        return F.array(*slots)

    folded = events.select(
        user_col, F.aggregate("__evs", init, fold).alias("__f")
    )
    out = folded.select(
        user_col,
        *[F.col("__f")[i].alias(f"{s}_ts") for i, s in enumerate(steps)],
    ).filter(F.col(f"{steps[0]}_ts").isNotNull())
    stage = None
    for i in range(k):
        c = F.col(f"{steps[i]}_ts").isNotNull().cast("int")
        stage = c if stage is None else stage + c
    return out.withColumn("stage_reached", stage)


def session_paths(
    df: DataFrame,
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_seconds: int = 1800,
    max_path_events: int = 20,
) -> DataFrame:
    """Path mining: the most common within-session event-type sequences
    ("view>view>click…") with session counts — the navigation-pattern
    report behind journey analysis and funnel DISCOVERY (event_funnel
    checks one known path; this surfaces which paths exist).

    Scale shape: sessionize shares its user-keyed window exchange; the
    path string builds per session from an ``array_sort`` over
    collected (ts, id, type) structs — deterministic under any arrival
    order, truncated to ``max_path_events`` so a pathological bot
    session cannot grow a row unboundedly (truncation marked with a
    '>…' suffix, keeping truncated paths distinct from genuine
    short ones). The final count-and-top-k aggregate runs on
    |sessions| rows with TakeOrdered, never a global sort.
    """
    s = sessionize(df, user_col, ts_col, id_col, gap_seconds)
    per_session = s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_sort(
            F.collect_list(
                F.struct(F.col(ts_col), F.col(id_col), F.col(type_col))
            )
        ).alias("_evs"),
    )
    path = F.concat(
        F.array_join(
            F.transform(
                F.slice(F.col("_evs"), 1, max_path_events),
                lambda e: e[type_col],
            ),
            ">",
        ),
        F.when(F.col("n_events") > max_path_events, F.lit(">…")).otherwise(
            F.lit("")
        ),
    )
    return (
        per_session.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(top_k)
    )
