"""As-of (time-travel) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with the same key
and ``right_ts <= left_ts``. Implemented as a composition of built-in
operators (preference (a) from the build rules): tag + union both sides,
then a per-key ``last(ignorenulls)`` running window ordered by (ts,
right-before-left) — one shuffle on the key, no Python, no O(n·m) range
explosion. This is the standard "sorted-merge as union" formulation and
it scales exactly like any windowed aggregate: state per key, sorted
within partition.

Ties: a right row AT the left timestamp matches (>= semantics, same as
DuckDB's ASOF JOIN, which oracle-checks this operator). For
determinism when multiple right rows share (key, ts), pre-aggregate the
right side to one row per (key, ts) before calling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``prefix``-renamed
    ``right_ts`` and ``value_cols`` from the latest right row at or
    before the left row's timestamp (NULLs when no such row)."""
    left_cols = left.columns
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left_cols
            if c != key
        ],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{prefix}{right_ts}"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
            for c in value_cols
        ],
        *[F.col(c).alias(f"__l_{c}") for c in left_cols if c != key],
    )
    u = r.unionByName(l)
    # right rows sort BEFORE left rows at equal ts → >= (inclusive) match
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), F.desc("__is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{prefix}{right_ts}"] + [f"{prefix}{c}" for c in value_cols]
    filled = u.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in carried
        ],
    )
    return filled.filter(F.col("__is_right") == 0).select(
        F.col(key),
        F.col("__ts").alias(left_ts),
        *[
            F.col(f"__l_{c}").alias(c)
            for c in left_cols
            if c not in (key, left_ts)
        ],
        *[F.col(f"__f_{c}").alias(c) for c in carried],
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: every event row matched with every
    interval row whose ``[start, end]`` contains the event timestamp
    (inclusive bounds — DuckDB ``BETWEEN`` semantics, which
    oracle-checks this operator).

    Expressed naively (``ON ts BETWEEN start AND end``) Spark has no
    equi-key and plans a BroadcastNestedLoopJoin — O(n·m) and a
    scale-killer. This rewrite buckets time: events get ONE bucket
    (``floor(ts / bucket)``), each interval is exploded to EVERY bucket
    it overlaps, and the join becomes an equi-join on the bucket id
    followed by the exact range filter. Each (event, interval) pair
    meets in exactly one bucket — the event's — so no distinct is
    needed. Cost: shuffle on bucket id; interval rows replicate by
    ``ceil(duration / bucket)``, so pick ``bucket`` near the TYPICAL
    interval duration (long outlier intervals fan out more — cap them
    upstream or raise the bucket size). Plan-asserted no-nested-loop in
    tests/test_plans.py.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left': {how!r}")
    step = F.expr(f"interval {bucket}")
    sec = F.unix_timestamp
    bucket_secs = F.lit(0) + (
        F.unix_timestamp(F.timestamp_seconds(F.lit(0)) + step)
    )  # bucket width in seconds, derived from the interval literal
    e = events.withColumn(
        "__b", F.floor(sec(F.col(ts_col)) / bucket_secs).cast("long")
    )
    i = intervals.withColumn(
        "__bs", F.floor(sec(F.col(start_col)) / bucket_secs).cast("long")
    ).withColumn("__be", F.floor(sec(F.col(end_col)) / bucket_secs).cast("long"))
    i = i.filter(F.col("__be") >= F.col("__bs")).withColumn(
        "__b", F.explode(F.sequence(F.col("__bs"), F.col("__be")))
    ).drop("__bs", "__be")
    cond = (
        (e["__b"] == i["__b"])
        & (e[ts_col] >= i[start_col])
        & (e[ts_col] <= i[end_col])
    )
    joined = e.join(i, cond, how).drop("__b")
    return joined
