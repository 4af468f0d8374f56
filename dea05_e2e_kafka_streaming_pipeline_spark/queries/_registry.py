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



def register(name: str, oracle: str | None = None, bench: bool = True):
    """Decorator registering a query (and optionally its DuckDB oracle).

    ``bench=False`` marks correctness-apparatus queries (cross-checks
    that deliberately re-run other pipelines, or hash-family mirrors
    that duplicate a production operator under a slower reproducible
    hash): they stay in the driver's correctness sweep but are excluded
    from the timing suite so BENCH totals compare like-for-like across
    rounds (see BASELINE.md)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        if not bench:
            _NO_BENCH.add(name)
        return fn

    return deco



def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)



def oracles() -> dict[str, str]:
    return dict(_ORACLES)



def bench_queries() -> dict[str, QueryFn]:
    """The workload subset bench.py times (excludes bench=False
    correctness apparatus)."""
    return {n: f for n, f in _QUERIES.items() if n not in _NO_BENCH}
