"""Skew-mitigation operators.

The reference's data model has deliberately skewed keys at scale — its
generators draw from only 50 customer ids
(streaming-source/topic_orders_streaming.py:17,20; SURVEY §7.4 risk 5),
so a fact table joined on customer_id concentrates into 50 reducer
partitions no matter how many executors exist.

First line of defense is AQE skew-join splitting (enabled in the session
factory). :func:`salted_join` is the explicit fallback for when AQE
can't help (e.g. the skewed side feeds an aggregation, or the planner
can't see the skew): the fact side gets a uniform salt in [0, n), the
dim side is replicated n× with every salt value, and the join key
becomes (key, salt) — splitting each hot key across n reducers at the
cost of an n× dim replication (dims are small; that is the trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with the hot-key shuffle
    split across ``num_salts`` partitions. Result is identical to the
    plain join (salt columns are internal and dropped).

    ``how`` is restricted to fact-preserving joins: under right/full
    outer joins the n-fold dim replication would emit one null-extended
    row per salt for unmatched dim keys.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} joins, not {how!r} — "
            "replicated dim rows would duplicate unmatched right-side output"
        )
    f = fact.withColumn(
        "__salt", F.floor(F.rand(seed) * num_salts).cast("int")
    )
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")
