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
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``prefix``-renamed
    ``right_ts`` and ``value_cols`` from the matched right row (NULLs
    when none). ``direction="backward"`` (default) matches the LATEST
    right row at or before the left timestamp; ``"forward"`` the
    EARLIEST right row at or after it — same single-shuffle
    union + last(ignorenulls) plan, with the window order mirrored.

    ``tolerance_seconds`` bounds the match the way pandas
    ``merge_asof(tolerance=...)`` does: a matched right row farther
    than the bound from the left timestamp is treated as NO match (all
    as-of columns NULL). Applied as a post-projection over the same
    plan — no extra shuffle, and the window still finds the nearest
    row first, so the bound never skips PAST a valid nearer match."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance_seconds is not None and tolerance_seconds < 0:
        raise ValueError("tolerance_seconds must be >= 0")
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
    # right rows sort BEFORE left rows at equal ts → inclusive match in
    # either direction; forward mirrors the scan order (ts descending),
    # so "last non-null above" = earliest right row at or after
    ts_order = F.col("__ts") if direction == "backward" else F.desc("__ts")
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.desc("__is_right"))
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
    if tolerance_seconds is None:
        within = F.lit(True)
    else:
        within = (
            F.abs(
                F.unix_micros(F.col("__ts"))
                - F.unix_micros(F.col(f"__f_{prefix}{right_ts}"))
            )
            <= int(tolerance_seconds * 1_000_000)
        )
    return filled.filter(F.col("__is_right") == 0).select(
        F.col(key),
        F.col("__ts").alias(left_ts),
        *[
            F.col(f"__l_{c}").alias(c)
            for c in left_cols
            if c not in (key, left_ts)
        ],
        *[
            F.when(within, F.col(f"__f_{c}")).otherwise(F.lit(None)).alias(c)
            for c in carried
        ],
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
    interval duration. A single interval may span at most
    ``max_buckets`` buckets (10k): an open-ended sentinel end date with
    an hourly bucket would otherwise materialize a multi-million-element
    sequence in ONE row and kill its executor — such rows fail fast
    with a clear error instead; clamp sentinel end dates (or raise the
    bucket size) upstream. Plan-asserted no-nested-loop in
    tests/test_plans.py.

    ``bucket`` must be a fixed-width duration of >= 1 second (hours /
    minutes / seconds / days): calendar units ("1 month") have no fixed
    width and sub-second buckets truncate to zero — both rejected at
    call time.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left': {how!r}")
    max_buckets = 10_000
    sec = F.unix_timestamp
    # bucket width parsed driver-side (no Spark job — plan builds must
    # stay job-free per the registry contract), failing fast on
    # calendar units and sub-second widths
    units = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}
    parts = bucket.strip().lower().split()
    if len(parts) < 2 or len(parts) % 2:
        raise ValueError(f"bucket must look like '1 hour' / '90 minutes': {bucket!r}")
    width = 0
    for qty, unit in zip(parts[::2], parts[1::2]):
        u = unit.rstrip("s")
        if u not in units:
            raise ValueError(
                f"bucket unit {unit!r} unsupported: need a fixed-width "
                f"duration unit in {sorted(units)} (calendar units like "
                "month/year have no fixed width; sub-second buckets "
                "truncate to zero)"
            )
        width += int(qty) * units[u]
    if width < 1:
        raise ValueError(f"bucket {bucket!r} resolves to {width} seconds")
    bucket_secs = F.lit(width)
    e = events.withColumn(
        "__b", F.floor(sec(F.col(ts_col)) / bucket_secs).cast("long")
    )
    i = intervals.withColumn(
        "__bs", F.floor(sec(F.col(start_col)) / bucket_secs).cast("long")
    ).withColumn("__be", F.floor(sec(F.col(end_col)) / bucket_secs).cast("long"))
    i = (
        i.filter(F.col("__be") >= F.col("__bs"))
        .withColumn(
            "__span",
            F.when(
                F.col("__be") - F.col("__bs") < max_buckets,
                F.col("__be") - F.col("__bs"),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "interval_join: an interval spans more than "
                            f"{max_buckets} buckets (start bucket "
                        ),
                        F.col("__bs").cast("string"),
                        F.lit(", end bucket "),
                        F.col("__be").cast("string"),
                        F.lit("); clamp sentinel end dates or raise `bucket`"),
                    )
                ).cast("long")
            ),
        )
        .withColumn("__b", F.explode(F.sequence(F.col("__bs"), F.col("__bs") + F.col("__span"))))
        .drop("__bs", "__be", "__span")
    )
    cond = (
        (e["__b"] == i["__b"])
        & (e[ts_col] >= i[start_col])
        & (e[ts_col] <= i[end_col])
    )
    joined = e.join(i, cond, how).drop("__b")
    return joined


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """The SAME as-of contract as :func:`asof_join`, expressed through
    ``groupBy().cogroup().applyInPandas`` — the API for custom per-key
    merge logic Spark's built-ins can't say: both sides co-shuffle on
    the key, and each key's (left, right) pandas frames meet in one
    Arrow-batched function (here: ``pandas.merge_asof``).

    The window-based :func:`asof_join` remains the production path
    (pure JVM, one shuffle); this variant exists (a) as the template
    for per-key logic that genuinely needs pandas — interpolation,
    curve fitting, per-entity models — and (b) as an independent
    implementation whose output must EQUAL the window plan
    (equivalence-tested), which cross-checks both. Determinism caveat
    shared with merge_asof: right-side (key, ts) must be unique.
    Skew caveat: one key = one pandas frame — a hot key materializes
    on one executor; salt first if a key can exceed executor memory.
    """
    import pandas as pd

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    out_fields = list(left.schema.fields)
    out_fields.append(
        T.StructField(f"{prefix}{right_ts}", right.schema[right_ts].dataType)
    )
    for c in value_cols:
        out_fields.append(T.StructField(f"{prefix}{c}", right.schema[c].dataType))
    out_schema = T.StructType(out_fields)
    left_cols = left.columns
    rsel = [key, right_ts, *value_cols]

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        ldf = ldf.sort_values(left_ts)
        if rdf.empty:  # key with no right rows: all as-of columns NULL
            merged = ldf.copy()
            merged[f"{prefix}{right_ts}"] = pd.NaT
            for c in value_cols:
                merged[f"{prefix}{c}"] = None
            return merged[[f.name for f in out_fields]]
        rdf = rdf[rsel].sort_values(right_ts).drop(columns=[key]).rename(
            columns={right_ts: f"{prefix}{right_ts}",
                     **{c: f"{prefix}{c}" for c in value_cols}}
        )
        merged = pd.merge_asof(
            ldf,
            rdf,
            left_on=left_ts,
            right_on=f"{prefix}{right_ts}",
            direction=direction,
            tolerance=(
                pd.Timedelta(seconds=tolerance_seconds)
                if tolerance_seconds is not None
                else None
            ),
        )
        return merged[[f.name for f in out_fields]]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, out_schema)
        .select(*left_cols, f"{prefix}{right_ts}", *[f"{prefix}{c}" for c in value_cols])
    )
