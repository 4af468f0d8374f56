"""Gold-layer analytical plans.

The reference's two gold transformations (its flagship queries):

- **daily sales by region** — reference ``enriched/daily_sales_aggregation.py:14-26``:
  orders ⋈ customers → group by (date, region) → count/sum/avg/count.
- **customer lifetime value (CLV)** — reference ``enriched/custome_lifetime_value.py:18-53``:
  per-customer multi-aggregate → derived tenure/cadence metrics → join
  customer demographics.

Engine-level deviations from the reference, both deliberate:

- Monetary sums aggregate as ``DECIMAL(18,2)`` and cast the result to
  double. Double summation is order-dependent; at 1000 executors the
  combine order is nondeterministic run-to-run, so exact decimal partial
  aggregation is the only way a 100 TB sum is reproducible (and it is what
  makes DuckDB-oracle hash comparison possible). Tungsten aggregates
  decimals with long arithmetic at this precision — effectively free.
- The dimension side is explicitly ``broadcast()``: customers is always
  the small side here, and a broadcast hash join removes the shuffle of
  the full fact table. (AQE would usually decide the same; the hint makes
  the plan stable.)

Faithfully preserved reference semantics:

- ``unique_customers`` is ``count(customer_id)`` — a NON-distinct count
  despite its name (reference ``daily_sales_aggregation.py:24``; SURVEY
  §2.4 trap). ``unique_customers_distinct`` is provided as the corrected
  variant.
- CLV's ``customer_tenure_days`` output column comes from the customers
  dimension (``custome_lifetime_value.py:48``), not the computed
  activity-span column of the same name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Exact partial-aggregation type for monetary sums (see module docstring).
_MONEY = "decimal(18,2)"


def build_daily_sales(
    orders: DataFrame,
    customers: DataFrame,
    with_processing_ts: bool = False,
    distinct_customers: bool = False,
) -> DataFrame:
    """Daily sales by region (reference daily_sales_aggregation.py:14-26).

    Physical shape at scale: broadcast(customers) hash join (no fact
    shuffle) → partial hash-agg per task → single shuffle on the
    (date, region) group keys → final agg. Group-key cardinality is
    |dates|×|regions|, far below partition count, so AQE coalesces the
    post-shuffle stage.
    """
    uniq = (
        F.countDistinct("customer_id")
        if distinct_customers
        else F.count("customer_id")
    )
    out = (
        orders.join(F.broadcast(customers), "customer_id", "inner")
        .groupBy(
            F.date_format("order_date", "yyyy-MM-dd").alias("date"),
            F.col("region"),
        )
        .agg(
            F.count("order_id").alias("total_orders"),
            F.sum(F.col("order_amount").cast(_MONEY))
            .cast("double")
            .alias("total_revenue"),
            (
                F.sum(F.col("order_amount").cast(_MONEY)).cast("double")
                / F.count("order_amount")
            ).alias("avg_order_value"),
            uniq.alias("unique_customers"),
        )
    )
    if with_processing_ts:
        out = out.withColumn("processing_timestamp", F.current_timestamp())
    return out


def build_clv(
    orders: DataFrame,
    customers: DataFrame,
    with_processing_ts: bool = False,
) -> DataFrame:
    """Customer lifetime value (reference custome_lifetime_value.py:18-53).

    One shuffle on ``customer_id`` for the aggregate; the demographics
    join is broadcast. The derived metrics (activity span, order cadence)
    are post-aggregation projections — no extra pass.
    """
    metrics = (
        orders.groupBy("customer_id")
        .agg(
            F.count("order_id").alias("total_orders"),
            F.sum(F.col("order_amount").cast(_MONEY))
            .cast("double")
            .alias("lifetime_value"),
            (
                F.sum(F.col("order_amount").cast(_MONEY)).cast("double")
                / F.count("order_amount")
            ).alias("avg_order_value"),
            F.min("order_date").alias("first_order_date"),
            F.max("order_date").alias("last_order_date"),
        )
        .withColumn(
            "activity_span_days",
            F.datediff(F.col("last_order_date"), F.col("first_order_date")),
        )
        .withColumn(
            "avg_days_between_orders",
            F.col("activity_span_days") / F.col("total_orders"),
        )
    )
    out = metrics.alias("m").join(
        F.broadcast(customers).alias("c"), on="customer_id", how="inner"
    ).select(
        F.col("customer_id"),
        F.col("c.name").alias("name"),
        F.col("c.email").alias("email"),
        F.col("c.region").alias("region"),
        F.col("m.total_orders").alias("total_orders"),
        F.col("m.lifetime_value").alias("lifetime_value"),
        F.col("m.avg_order_value").alias("avg_order_value"),
        # reference picks the DIMENSION tenure column here (:48), not the
        # computed activity span — preserved for parity
        F.col("c.customer_tenure_days").alias("customer_tenure_days"),
        F.col("m.avg_days_between_orders").alias("avg_days_between_orders"),
        F.col("m.first_order_date").alias("first_order_date"),
        F.col("m.last_order_date").alias("last_order_date"),
    )
    if with_processing_ts:
        out = out.withColumn("processing_timestamp", F.current_timestamp())
    return out
