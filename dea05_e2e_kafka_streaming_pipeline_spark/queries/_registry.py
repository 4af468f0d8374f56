"""Registry plumbing: the @register decorator and the driver-facing
accessors. Family modules import register from here; the package
__init__ imports the accessors back out."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


QueryFn = Callable[[SparkSession, str], DataFrame]


_QUERIES: dict[str, QueryFn] = {}

_ORACLES: dict[str, str] = {}

_NO_BENCH: set[str] = set()

_AUDITED_BY: dict[str, tuple[str, ...]] = {}

_BENCH_TIER_MAX: dict[str, float] = {}



def register(
    name: str,
    oracle: str | None = None,
    bench: bool = True,
    audited_by: tuple[str, ...] | list[str] | None = None,
    bench_tier_max: float | None = None,
):
    """Decorator registering a query (and optionally its DuckDB oracle).

    ``bench=False`` marks correctness-apparatus queries (cross-checks
    that deliberately re-run other pipelines, or hash-family mirrors
    that duplicate a production operator under a slower reproducible
    hash): they stay in the driver's correctness sweep but are excluded
    from the timing suite so BENCH totals compare like-for-like across
    rounds (see BASELINE.md).

    ``audited_by`` names the companion queries that pin a no-oracle
    (rows-only) query's correctness — md5-family mirrors, zero-row
    violation audits, hash-matched deterministic twins. The sweep
    records them in each rows-only CORRECTNESS entry and FAILS the
    rows-only query if a named companion ran in the same sweep without
    hash-matching, so the contract file is self-adjudicating (round-5
    verdict item 3).

    ``bench_tier_max`` bounds the scale tier the query is TIMED at:
    at sf > bench_tier_max the query is dropped from the bench wall
    (it still sweeps for correctness wherever its oracle is feasible).
    This is the EXHIBITS mechanism for the deliberately-quadratic
    SQL-exactness anchors (fixed-cardinality blocking): they prove
    semantics at oracle scale but their wall at 10x input measures a
    known-n² plan, which certifies the wrong thing (round-5 verdict
    item 2 — they were 63% of the x10 suite wall)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        if not bench:
            _NO_BENCH.add(name)
        if audited_by:
            _AUDITED_BY[name] = tuple(audited_by)
        if bench_tier_max is not None:
            _BENCH_TIER_MAX[name] = float(bench_tier_max)
        return fn

    return deco



def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)



def oracles() -> dict[str, str]:
    return dict(_ORACLES)



def audited_by() -> dict[str, tuple[str, ...]]:
    """Companion-audit map for rows-only queries (see register)."""
    return dict(_AUDITED_BY)



def bench_queries(sf: float | None = None) -> dict[str, QueryFn]:
    """The workload subset bench.py times (excludes bench=False
    correctness apparatus; with ``sf`` given, also excludes exhibits
    whose bench_tier_max is below that scale)."""
    out = {n: f for n, f in _QUERIES.items() if n not in _NO_BENCH}
    if sf is not None:
        out = {
            n: f
            for n, f in out.items()
            if sf <= _BENCH_TIER_MAX.get(n, float("inf"))
        }
    return out



def bench_exhibits(sf: float) -> list[str]:
    """Names bench_queries(sf) excludes at this tier (reported in the
    bench stdout line so the ledger documents the split)."""
    return sorted(
        n
        for n in _QUERIES
        if n not in _NO_BENCH and sf > _BENCH_TIER_MAX.get(n, float("inf"))
    )
