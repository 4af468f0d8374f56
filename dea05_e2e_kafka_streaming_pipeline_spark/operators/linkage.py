"""Probabilistic record linkage (entity resolution) — blocked
Fellegi–Sunter scoring.

Beyond reference parity (SURVEY §2 has no entity resolution; its DQ
suite checks single-table validity) but core to curation at scale:
linking records that denote the same real-world entity across (or
within) tables is the structured-data sibling of document dedup, and
shares the same scale discipline — NEVER all-pairs, always blocking.

Model (Fellegi & Sunter 1969, public literature): each candidate pair
gets a score Σ_f w_f where field f contributes its agreement weight
log2(m_f/u_f) when the comparison agrees and log2((1−m_f)/(1−u_f))
when it disagrees. Weights here are caller-supplied SCALED INTEGERS
(the conventional "match points"), not floats computed from m/u at
runtime — integer sums are exact, order-insensitive, and oracle-
checkable bit-for-bit across engines (same policy as
operators/graph.py fixed-point ranks).

Scale shape: candidate generation is an equi-join on the blocking key —
pair volume is Σ_b |L_b|·|R_b|, never |L|·|R|; scoring is a pure
projection on the joined row. Skewed blocks are the caller's lever
(finer blocking key, or cap via the same degenerate-bucket machinery
as operators/dedup.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldComparison:
    """One field's contribution to the match score.

    ``predicate(l, r)`` receives the left/right column and returns a
    boolean agreement Column; ``agree``/``disagree`` are the integer
    match points added for each outcome. A NULL on either side scores
    0 (the standard missing-data neutrality rule)."""

    name: str
    left_col: str
    right_col: str
    predicate: Callable[[Column, Column], Column]
    agree: int
    disagree: int


def exact(l: Column, r: Column) -> Column:  # noqa: E741 — l/r pair
    return l == r


def within(tolerance: float) -> Callable[[Column, Column], Column]:
    return lambda l, r: F.abs(l - r) <= F.lit(tolerance)


def prefix(n: int) -> Callable[[Column, Column], Column]:
    return lambda l, r: F.substring(l, 1, n) == F.substring(r, 1, n)


def blocked_linkage(
    left: DataFrame,
    right: DataFrame,
    block_on: list[str],
    comparisons: list[FieldComparison],
    left_id: str,
    right_id: str,
    min_score: int,
    dedup_self_pairs: bool = False,
) -> DataFrame:
    """Score candidate pairs that share a blocking key.

    Returns (left id, right id, one int column per comparison with
    that field's points, ``score``) for every pair with
    ``score >= min_score``. With ``dedup_self_pairs=True`` (linking a
    table to itself) only ``left_id < right_id`` pairs emit, so each
    unordered pair appears once and identity pairs never do."""
    lcols = {left_id, *block_on, *(c.left_col for c in comparisons)}
    rcols = {right_id, *block_on, *(c.right_col for c in comparisons)}
    l = left.select(*[F.col(c).alias(f"l_{c}") for c in sorted(lcols)])
    r = right.select(*[F.col(c).alias(f"r_{c}") for c in sorted(rcols)])
    if not block_on:
        raise ValueError("blocking is mandatory — all-pairs linkage is a scale bug")
    cond = [F.col(f"l_{c}").eqNullSafe(F.col(f"r_{c}")) for c in block_on]
    if dedup_self_pairs:
        cond.append(F.col(f"l_{left_id}") < F.col(f"r_{right_id}"))
    pairs = l.join(r, _conj(cond))

    point_cols = []
    for c in comparisons:
        lc, rc = F.col(f"l_{c.left_col}"), F.col(f"r_{c.right_col}")
        pts = (
            F.when(lc.isNull() | rc.isNull(), F.lit(0))
            .when(c.predicate(lc, rc), F.lit(c.agree))
            .otherwise(F.lit(c.disagree))
        )
        point_cols.append(pts.alias(f"pts_{c.name}"))
    scored = pairs.select(
        F.col(f"l_{left_id}").alias("left_id"),
        F.col(f"r_{right_id}").alias("right_id"),
        *point_cols,
    ).withColumn(
        "score",
        sum((F.col(f"pts_{c.name}") for c in comparisons), F.lit(0)),
    )
    return scored.filter(F.col("score") >= min_score)


def _conj(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def jaro_winkler(s1: Column | str, s2: Column | str) -> Column:
    """Jaro-Winkler similarity as an Arrow-vectorized pandas UDF — the
    name-matching comparator classical record linkage runs where exact/
    prefix agreement is too brittle (typos, transpositions) and
    Levenshtein (Spark's built-in) over-penalizes transposed characters
    in short strings. Matches DuckDB's native
    ``jaro_winkler_similarity`` bit-for-bit (empty string → 0.0, boost
    threshold 0.7, prefix bonus ≤ 4 chars at p = 0.1) — property-tested
    against it on thousands of random pairs, which is what lets
    registry queries using it keep a hash-matching oracle.

    UDF-policy note: this is the documented custom-function tier
    (per-row string algorithm with data-dependent inner loops — not
    expressible in codegen Column algebra without a quadratic explode).
    Arrow batches amortize the transfer; the O(len²) core runs once
    per pair, exactly like the reference implementations. Use AFTER
    blocking (``blocked_linkage`` candidates), never on a raw pair
    space.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _jw(a, b):
        def jaro(x: str, y: str) -> float:
            l1, l2 = len(x), len(y)
            if not l1 or not l2:
                return 0.0
            if x == y:
                return 1.0
            md = max(l1, l2) // 2 - 1
            m1 = [False] * l1
            m2 = [False] * l2
            m = 0
            for i in range(l1):
                lo, hi = max(0, i - md), min(l2, i + md + 1)
                for j in range(lo, hi):
                    if not m2[j] and x[i] == y[j]:
                        m1[i] = m2[j] = True
                        m += 1
                        break
            if m == 0:
                return 0.0
            t = 0
            k = 0
            for i in range(l1):
                if m1[i]:
                    while not m2[k]:
                        k += 1
                    if x[i] != y[k]:
                        t += 1
                    k += 1
            t //= 2
            return (m / l1 + m / l2 + (m - t) / m) / 3

        def jw(x: str | None, y: str | None) -> float | None:
            if x is None or y is None:
                return None
            j = jaro(x, y)
            if j <= 0.7:
                return j
            p = 0
            for cx, cy in zip(x, y):
                if cx == cy and p < 4:
                    p += 1
                else:
                    break
            return j + p * 0.1 * (1 - j)

        return pd.Series([jw(x, y) for x, y in zip(a, b)], dtype="float64")

    # postponed-annotations module: set the signature explicitly so
    # pandas_udf recognizes the SCALAR (Series, Series) -> Series shape
    _jw.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    _jw_udf = pandas_udf(_jw, "double")

    c1 = F.col(s1) if isinstance(s1, str) else s1
    c2 = F.col(s2) if isinstance(s2, str) else s2
    return _jw_udf(c1, c2)
