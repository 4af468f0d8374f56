"""Query registry — the driver-facing catalog of every implemented operator.

Each entry pairs a Spark implementation (``(spark, sf_dir) -> DataFrame``)
with an equivalent ANSI-SQL oracle string DuckDB runs over the same
parquet tables (pre-registered views: region nation customer supplier part
orders lineitem events documents embeddings). Column names/aliases match
exactly — the driver sorts columns by name and hash-compares values.

Determinism rules applied throughout (so hashes can match at all):

- Monetary sums aggregate as DECIMAL(18,2) then cast to double in BOTH
  engines (order-insensitive exact sums; see plans/gold.py docstring).
- No ``current_timestamp``/``current_date`` in oracle-checked outputs;
  fixed literals replace wall-clock bounds.
- Ratios divide an exact decimal (cast to double) by an exact count —
  a single IEEE double op, identical in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dea05_e2e_kafka_streaming_pipeline_spark.plans.gold import (
    build_clv,
    build_daily_sales,
)
from dea05_e2e_kafka_streaming_pipeline_spark.sources.entities import (
    CUSTOMERS_SQL,
    ORDERS_SQL,
    load_customers,
    load_orders,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator registering a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    return dict(_ORACLES)


# Shared oracle CTE prologue mapping testdata → reference entities
# (FIXTURES.md §4; mirrors sources/entities.py exactly).
_ENTITY_CTES = f"WITH o AS ({ORDERS_SQL}), c AS ({CUSTOMERS_SQL})"

# exact decimal sum, surfaced as double (see module docstring)
_SUM_AMOUNT = "CAST(SUM(CAST(o.order_amount AS DECIMAL(18,2))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Gold-layer queries (reference enriched/*.py)
# ---------------------------------------------------------------------------

@register(
    "daily_sales_by_region",
    oracle=f"""
    {_ENTITY_CTES}
    SELECT strftime(o.order_date, '%Y-%m-%d') AS date,
           c.region AS region,
           count(o.order_id) AS total_orders,
           {_SUM_AMOUNT} AS total_revenue,
           {_SUM_AMOUNT} / count(o.order_amount) AS avg_order_value,
           count(o.customer_id) AS unique_customers
    FROM o JOIN c USING (customer_id)
    GROUP BY 1, 2
    """,
)
def q_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference enriched/daily_sales_aggregation.py:14-26."""
    return build_daily_sales(load_orders(spark, sf_dir), load_customers(spark, sf_dir))


@register(
    "customer_lifetime_value",
    oracle=f"""
    {_ENTITY_CTES},
    m AS (
      SELECT o.customer_id,
             count(o.order_id) AS total_orders,
             {_SUM_AMOUNT} AS lifetime_value,
             {_SUM_AMOUNT} / count(o.order_amount) AS avg_order_value,
             min(o.order_date) AS first_order_date,
             max(o.order_date) AS last_order_date
      FROM o GROUP BY o.customer_id
    )
    SELECT m.customer_id, c.name, c.email, c.region,
           m.total_orders, m.lifetime_value, m.avg_order_value,
           c.customer_tenure_days,
           CAST(date_diff('day', m.first_order_date, m.last_order_date) AS INT)
             / m.total_orders AS avg_days_between_orders,
           m.first_order_date, m.last_order_date
    FROM m JOIN c USING (customer_id)
    """,
)
def q_clv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference enriched/custome_lifetime_value.py:18-53."""
    return build_clv(load_orders(spark, sf_dir), load_customers(spark, sf_dir))
