"""Registry queries: incremental family. Split from queries.py
(r4 verdict item 2); registration order within the family preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.queries._registry import (  # noqa: F401
    register,
)
from dea05_e2e_kafka_streaming_pipeline_spark.queries._shared import *  # noqa: F401,F403




@register(
    "incremental_daily_sales",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS order_day,
           count(o_orderkey) AS total_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_revenue,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(o_totalprice) AS avg_order_value,
           max(o_totalprice) AS max_order_value
    FROM orders
    GROUP BY 1
    """,
)
def q_incremental_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance proof: the day-level sales
    aggregate computed INCREMENTALLY — the fact table split by order-key
    parity, each half partial-aggregated, the halves merged, the state
    finalized — must hash-match DuckDB's one-shot GROUP BY over the
    whole table. Decimal partial sums make the fold order
    irrelevant; the double conversion happens only at finalize."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
        finalize_aggregate,
        incremental_update,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_day", F.col("o_orderdate").cast("date")
    )
    keys = ["order_day"]
    spec = [
        ("total_orders", "o_orderkey", "count"),
        ("total_revenue", "o_totalprice", "sum"),
        ("avg_order_value", "o_totalprice", "avg"),
        ("max_order_value", "o_totalprice", "max"),
    ]
    state = incremental_update(
        None, orders.filter(F.col("o_orderkey") % 2 == 0), keys, spec
    )
    state = incremental_update(
        state, orders.filter(F.col("o_orderkey") % 2 == 1), keys, spec
    )
    return finalize_aggregate(state, keys, spec)




@register(
    "retractable_daily_sales",
    oracle="""
    WITH eff AS (
      SELECT CASE WHEN o_orderkey % 20 = 0
                  THEN strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 DAY,
                                '%Y-%m-%d')
                  ELSE strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
             END AS day,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS amount
      FROM orders
      WHERE o_orderkey % 10 <> 1
    )
    SELECT day,
           CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM eff GROUP BY 1
    """,
)
def q_retractable_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-aware incremental view maintenance: daily revenue is
    maintained as abelian-group state (sign-weighted decimal sums)
    through a base load plus a CDC change batch containing deletes
    (orderkey%10==1), in-place price updates (%10==0: +100), and
    GROUP-CHANGING updates (%20==0 additionally moves to the next
    day) — then finalized and hash-matched against a from-scratch
    GROUP BY over the post-change fact table. Never rescans history;
    updates lower to delete(before)+insert(after) signed facts."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
        finalize_retractable,
        retractable_update,
        signed_cdc_facts,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    day = F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
    day_shift = F.date_format(
        F.date_add(F.col("o_orderdate").cast("date"), 1), "yyyy-MM-dd"
    )
    amount = F.col("o_totalprice")
    k = F.col("o_orderkey")

    base = orders.select(
        F.lit("c").alias("op"),
        F.lit(None).cast("string").alias("before_day"),
        F.lit(None).cast("double").alias("before_amount"),
        day.alias("after_day"),
        amount.alias("after_amount"),
    )
    updates = orders.filter(k % 10 == 0).select(
        F.lit("u").alias("op"),
        day.alias("before_day"),
        amount.alias("before_amount"),
        F.when(k % 20 == 0, day_shift).otherwise(day).alias("after_day"),
        (amount + F.lit(100.0)).alias("after_amount"),
    )
    deletes = orders.filter(k % 10 == 1).select(
        F.lit("d").alias("op"),
        day.alias("before_day"),
        amount.alias("before_amount"),
        F.lit(None).cast("string").alias("after_day"),
        F.lit(None).cast("double").alias("after_amount"),
    )

    measures = [("revenue", "amount")]
    state = retractable_update(
        None, signed_cdc_facts(base, ["day", "amount"]), ["day"], measures
    )
    state = retractable_update(
        state,
        signed_cdc_facts(updates.unionByName(deletes), ["day", "amount"]),
        ["day"],
        measures,
    )
    return finalize_retractable(state, ["day"], measures)




@register(
    "retractable_minmax_sales",
    oracle="""
    WITH eff AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             CASE WHEN o_orderkey % 10 = 7 THEN o_totalprice - 50.0
                  ELSE o_totalprice END AS amount
      FROM orders
      WHERE o_orderkey % 3 <> 0
    )
    SELECT day,
           MIN(amount) AS min_amount,
           MAX(amount) AS max_amount
    FROM eff GROUP BY 1
    """,
)
def q_retractable_minmax_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX under retraction (r4 verdict item 5): per-day price
    extrema maintained through a DELETE-HEAVY CDC batch (every third
    order deleted — enough to burn through k=4 runner-ups on many days
    and exercise the underflow rebuild) plus in-place price updates
    (%10==7: -50). min/max are not invertible, so the state is the
    bounded per-(group, side) value-buffer of
    plans/incremental.py:retractable_minmax_update — k smallest
    distinct live values with multiplicities (max side negated), exact
    while non-empty, rebuilt from the post-change base table only for
    underflowing groups — finalized and hash-matched against a
    from-scratch GROUP BY min/max."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.incremental import (
        finalize_retractable_minmax,
        minmax_state_from_base,
        retractable_minmax_update,
        signed_cdc_facts,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    day = F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
    amount = F.col("o_totalprice")
    k = F.col("o_orderkey")

    base_facts = orders.select(day.alias("day"), amount.alias("amount"))
    state = minmax_state_from_base(base_facts, ["day"], "amount", k=4)

    deletes = orders.filter(k % 3 == 0).select(
        F.lit("d").alias("op"),
        day.alias("before_day"),
        amount.alias("before_amount"),
        F.lit(None).cast("string").alias("after_day"),
        F.lit(None).cast("double").alias("after_amount"),
    )
    updates = orders.filter((k % 10 == 7) & (k % 3 != 0)).select(
        F.lit("u").alias("op"),
        day.alias("before_day"),
        amount.alias("before_amount"),
        day.alias("after_day"),
        (amount - F.lit(50.0)).alias("after_amount"),
    )
    signed = signed_cdc_facts(
        deletes.unionByName(updates), ["day", "amount"]
    )
    base_after = orders.filter(k % 3 != 0).select(
        day.alias("day"),
        F.when(k % 10 == 7, amount - F.lit(50.0)).otherwise(amount)
        .alias("amount"),
    )
    state = retractable_minmax_update(
        state, signed, base_after, ["day"], "amount", k=4
    )
    return finalize_retractable_minmax(state, ["day"], "min_amount", "max_amount")
