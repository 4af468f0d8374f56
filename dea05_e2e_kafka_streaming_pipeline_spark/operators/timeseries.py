"""Time-series subsequence similarity search.

Beyond reference parity (its analytics stop at calendar-grain
aggregates) — the streaming-systems workload the EDBT'19 line of work
("Time Series Similarity Search for Streaming Data in Distributed
Systems") studies: given a query pattern of length m, find the
corpus subsequences (per-key sliding windows) closest to it.

Spark-first shape: the sliding windows ARE a window-function frame —
``collect_list(value) OVER (PARTITION BY key ORDER BY ts ROWS BETWEEN
CURRENT ROW AND m-1 FOLLOWING)`` materializes each position's
subsequence without a self-join or explode-regroup, and the distance
is one ``zip_with`` + ``aggregate`` fold over that array — all
codegen, no UDF. Top-k is TakeOrderedAndProject.

Determinism discipline: squared-Euclidean distance accumulates in
DECIMAL (values quantized to 6 fractional digits, squares carried at
scale 12), so the fold order can never change a hash-checked result —
float accumulation would differ between engines and partitionings.

At 100 TB: per-key windows shuffle once on the series key; m stays
small (a pattern, not a series), so state per row is O(m). For
million-point single series, split the key space by time range with
m-overlap — the same trick chunk_documents uses for token windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: quantization applied to both corpus values and the query pattern
_VAL_DEC = "decimal(18,6)"
#: accumulator type for the squared-diff sum
_ACC_DEC = "decimal(32,12)"


def subsequence_search(
    df: DataFrame,
    query_pattern: list[float],
    k: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    center: bool = False,
) -> DataFrame:
    """Top-``k`` sliding-window subsequences (per ``key_col``, ordered
    by ``ts_col``) with the smallest exact squared-Euclidean distance
    to ``query_pattern``.

    ``center=True`` matches SHAPE ignoring vertical offset (the first
    half of UCR z-normalization): both window and pattern are mean-
    centered before the distance. To stay division-free (1/m is not an
    exact decimal for general m) the implementation ranks by the
    scaled form ``Σ (m·xᵢ − S)²  =  m²·Σ (xᵢ − μ)²`` — same ordering,
    every intermediate an exact decimal, and the m² scaling is
    documented in the output (``dist2`` is the scaled value).

    Returns (key, start_ts, dist2) with ``dist2`` the decimal-exact
    (scaled, if centered) squared distance cast to double for display.
    Windows shorter than the pattern (series tails) are excluded.
    """
    m = len(query_pattern)
    if m < 1:
        raise ValueError("query_pattern must be non-empty")
    if center:
        qs = sum(round(float(v), 6) for v in query_pattern)
        query_pattern = [m * round(float(v), 6) - qs for v in query_pattern]
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    frame = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, m - 1)
    )
    win = F.collect_list(F.col(value_col).cast(_VAL_DEC)).over(frame)
    q = F.array(*[F.lit(round(float(v), 6)).cast(_VAL_DEC) for v in query_pattern])
    if center:
        wsum = F.aggregate(
            "win",
            F.lit(0).cast("decimal(24,6)"),
            lambda acc, x: (acc + x).cast("decimal(24,6)"),
        )
        cmp_win = F.transform(
            "win", lambda x: (x * F.lit(m) - wsum).cast("decimal(24,6)")
        )
    else:
        cmp_win = F.col("win")
    sq_diffs = F.zip_with(
        cmp_win, q, lambda a, b: ((a - b) * (a - b)).cast(_ACC_DEC)
    )
    dist2 = F.aggregate(
        sq_diffs,
        F.lit(0).cast(_ACC_DEC),
        lambda acc, x: (acc + x).cast(_ACC_DEC),
    )
    start_cols = [F.col(ts_col).alias("start_ts")] + (
        [F.col(tiebreak_col).alias("start_id")] if tiebreak_col else []
    )
    out_cols = ["start_ts"] + (["start_id"] if tiebreak_col else [])
    # the total ordering must be unique per window, or the k-boundary
    # would be engine-dependent — start_id (when given) guarantees it
    return (
        df.select(F.col(key_col), *start_cols, win.alias("win"))
        .filter(F.size("win") == m)
        .select(key_col, *out_cols, dist2.cast("double").alias("dist2"))
        .orderBy("dist2", key_col, *out_cols)
        .limit(k)
    )
