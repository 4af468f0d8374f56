"""Incremental aggregate maintenance (materialized-view upkeep).

At 100 TB you do not recompute a gold aggregate from scratch because a
day of new facts arrived — you keep the aggregate as a PARTIAL-state
table (sums, counts, mins, maxes per group) and fold each new batch
into it: ``new_state = merge(state, partial(batch))``. The final
metrics (averages, double-typed sums) are a stateless projection over
the state, computed at read time.

This is exactly Spark's own partial-aggregation contract
(`partial_sum` → final merge in every HashAggregate pair) lifted to
the table level, with the same algebra requirements: every maintained
measure must be a commutative monoid over the partial columns. sum /
count / min / max are; avg is maintained as (sum, count) and finalized
by division. Monetary sums stay exact decimals IN THE STATE and only
become doubles at finalize — merge order can never change a result
(the same discipline the batch gold plans use).

Correctness is pinned two ways: the `incremental_daily_sales` registry
row computes a day-level aggregate by splitting the fact table,
folding the halves through partial→merge→finalize, and hash-matching
DuckDB's direct GROUP BY over the whole table; property tests assert
merge associativity and state-vs-recompute equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "partial_aggregate",
    "merge_partials",
    "finalize_aggregate",
    "incremental_update",
]

_MONEY = "decimal(18,2)"
_KINDS = ("sum", "count", "min", "max", "avg")


def _state_cols(name: str, kind: str) -> list[str]:
    if kind == "sum":
        return [f"__{name}_sum"]
    if kind == "count":
        return [f"__{name}_cnt"]
    if kind == "avg":
        return [f"__{name}_sum", f"__{name}_cnt"]
    return [f"__{name}_{kind}"]  # min / max


def partial_aggregate(
    df: DataFrame,
    keys: list[str],
    spec: list[tuple[str, str, str]],
    money: str = _MONEY,
) -> DataFrame:
    """Aggregate a batch to its partial state: one row per group with
    the mergeable partial columns for every measure in ``spec``
    (``(out_name, source_col, kind)`` with kind in sum / count / min /
    max / avg). Numeric sums accumulate as exact decimal."""
    aggs = []
    for name, src, kind in spec:
        if kind not in _KINDS:
            raise ValueError(f"unknown agg kind {kind!r} for {name!r}")
        if kind in ("sum", "avg"):
            aggs.append(
                F.sum(F.col(src).cast(money)).alias(f"__{name}_sum")
            )
        if kind in ("count", "avg"):
            target = F.col(src) if kind == "avg" else F.col(src)
            aggs.append(F.count(target).alias(f"__{name}_cnt"))
        if kind == "min":
            aggs.append(F.min(src).alias(f"__{name}_min"))
        if kind == "max":
            aggs.append(F.max(src).alias(f"__{name}_max"))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    spec: list[tuple[str, str, str]],
) -> DataFrame:
    """Fold two partial-state tables into one: sums and counts add,
    mins take min, maxes take max — groups present in only one side
    pass through. Associative and commutative by construction, so any
    merge tree over any batch split yields the same state."""
    aggs = []
    for name, _src, kind in spec:
        for c in _state_cols(name, kind):
            if c.endswith("_min"):
                aggs.append(F.min(c).alias(c))
            elif c.endswith("_max"):
                aggs.append(F.max(c).alias(c))
            else:  # _sum or _cnt
                aggs.append(F.sum(c).alias(c))
    return a.unionByName(b).groupBy(*keys).agg(*aggs)


def finalize_aggregate(
    state: DataFrame,
    keys: list[str],
    spec: list[tuple[str, str, str]],
) -> DataFrame:
    """The read-time projection from partial state to final metrics:
    sums surface as double, avgs divide double(sum) by count — the
    same finalization the one-shot gold plans apply, so incremental
    and from-scratch results are bit-identical."""
    cols = [F.col(k) for k in keys]
    for name, _src, kind in spec:
        if kind == "sum":
            cols.append(F.col(f"__{name}_sum").cast("double").alias(name))
        elif kind == "count":
            cols.append(F.col(f"__{name}_cnt").alias(name))
        elif kind == "avg":
            cols.append(
                (
                    F.col(f"__{name}_sum").cast("double")
                    / F.col(f"__{name}_cnt")
                ).alias(name)
            )
        else:
            cols.append(F.col(f"__{name}_{kind}").alias(name))
    return state.select(*cols)


def incremental_update(
    state: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    spec: list[tuple[str, str, str]],
    money: str = _MONEY,
) -> DataFrame:
    """One maintenance step: partial-aggregate the new batch and merge
    it into the existing state (``None`` state = first batch). Cost is
    one shuffle of the BATCH plus a state-sized merge — never a
    rescan of history."""
    part = partial_aggregate(batch, keys, spec, money=money)
    if state is None:
        return part
    return merge_partials(state, part, keys, spec)
