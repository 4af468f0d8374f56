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
