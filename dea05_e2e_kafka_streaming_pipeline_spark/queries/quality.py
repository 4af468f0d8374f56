"""Registry queries: quality family. Split from queries.py
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
    "profile_orders",
    oracle=(
        f"WITH o AS (SELECT order_id, order_date, "
        f"CAST(order_amount AS DECIMAL(18,2)) AS order_amount, customer_id "
        f"FROM ({ORDERS_SQL}))\n"
        + " UNION ALL ".join(
            _PROFILE_COL.format(c=c)
            for c in ("order_id", "order_date", "order_amount", "customer_id")
        )
    ),
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan table profile (operators/quality.py:profile_table) over
    the orders entity: per column — total, nulls, exact distinct,
    native-ordered min/max as strings. The amount column is cast to
    decimal(18,2) first so its string form is engine-exact. The oracle
    computes each column's stats independently; the engine computes all
    of them in ONE aggregate (the reference ran a Spark job per column,
    curated/data_quality.py:37-39)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
        profile_table,
    )

    orders = load_orders(spark, sf_dir).withColumn(
        "order_amount", F.col("order_amount").cast("decimal(18,2)")
    )
    return profile_table(
        orders, ["order_id", "order_date", "order_amount", "customer_id"]
    )




@register(
    "dq_orders_report",
    oracle=f"""
    {_ENTITY_CTES},
    agg AS (
      SELECT count(*) AS total,
             CAST(SUM(CASE WHEN order_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_order_id,
             CAST(SUM(CASE WHEN order_date IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_order_date,
             CAST(SUM(CASE WHEN order_amount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_order_amount,
             CAST(SUM(CASE WHEN customer_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customer_id,
             CAST(SUM(CASE WHEN NOT (order_amount > 0) THEN 1 ELSE 0 END) AS BIGINT) AS v_amount,
             CAST(SUM(CASE WHEN NOT (order_date <= DATE '{_DQ_DATE_BOUND}') THEN 1 ELSE 0 END) AS BIGINT) AS v_date
      FROM o
    ),
    orph AS (
      SELECT CAST(count(*) AS BIGINT) AS cnt FROM o
      WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.customer_id = o.customer_id)
    ),
    long AS (
      SELECT 'completeness' AS check_type, 'order_id' AS check_name, total AS total_rows,
             n_order_id AS failed_count, 5.0 AS threshold_pct FROM agg
      UNION ALL SELECT 'completeness', 'order_date', total, n_order_date, 5.0 FROM agg
      UNION ALL SELECT 'completeness', 'order_amount', total, n_order_amount, 5.0 FROM agg
      UNION ALL SELECT 'completeness', 'customer_id', total, n_customer_id, 5.0 FROM agg
      UNION ALL SELECT 'accuracy', 'positive_amount', total, v_amount, 1.0 FROM agg
      UNION ALL SELECT 'accuracy', 'date_not_future', total, v_date, 1.0 FROM agg
      UNION ALL SELECT 'consistency', 'orders_customer_fk', agg.total, orph.cnt, 1.0 FROM agg, orph
    )
    SELECT check_type, check_name, total_rows, failed_count,
           CASE WHEN total_rows != 0
                THEN CAST(failed_count AS DOUBLE) * 100.0 / total_rows
                ELSE 0.0 END AS failed_pct,
           threshold_pct,
           CASE WHEN (CASE WHEN total_rows != 0
                           THEN CAST(failed_count AS DOUBLE) * 100.0 / total_rows
                           ELSE 0.0 END) < threshold_pct
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM long
    """,
)
def q_dq_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference curated/data_quality.py:137-157 — full DQ sweep over the
    orders entity, folded into one scan + one broadcast anti-join."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
        DataQualityValidator,
    )

    orders = load_orders(spark, sf_dir)
    customers = load_customers(spark, sf_dir)
    return (
        DataQualityValidator(orders, name="orders")
        .check_completeness(["order_id", "order_date", "order_amount", "customer_id"])
        .check_accuracy("positive_amount", F.col("order_amount") > 0)
        .check_accuracy(
            "date_not_future", F.col("order_date") <= F.lit(_DQ_DATE_BOUND).cast("date")
        )
        .check_consistency("orders_customer_fk", customers, "customer_id")
        .report()
    )




@register(
    "dq_customers_report",
    oracle=f"""
    {_ENTITY_CTES},
    agg AS (
      SELECT count(*) AS total,
             CAST(SUM(CASE WHEN customer_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cid,
             CAST(SUM(CASE WHEN name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_name,
             CAST(SUM(CASE WHEN region IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_region,
             CAST(SUM(CASE WHEN NOT (customer_tenure_days > 0) THEN 1 ELSE 0 END) AS BIGINT) AS v_tenure
      FROM c
    ),
    long AS (
      SELECT 'completeness' AS check_type, 'customer_id' AS check_name,
             total AS total_rows, n_cid AS failed_count, 5.0 AS threshold_pct FROM agg
      UNION ALL SELECT 'completeness', 'name', total, n_name, 5.0 FROM agg
      UNION ALL SELECT 'completeness', 'region', total, n_region, 5.0 FROM agg
      UNION ALL SELECT 'accuracy', 'positive_tenure', total, v_tenure, 1.0 FROM agg
    )
    SELECT check_type, check_name, total_rows, failed_count,
           CASE WHEN total_rows != 0
                THEN CAST(failed_count AS DOUBLE) * 100.0 / total_rows
                ELSE 0.0 END AS failed_pct,
           threshold_pct,
           CASE WHEN (CASE WHEN total_rows != 0
                           THEN CAST(failed_count AS DOUBLE) * 100.0 / total_rows
                           ELSE 0.0 END) < threshold_pct
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM long
    """,
)
def q_dq_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ sweep over the customers entity (reference
    curated/data_quality.py:152-157 companion path)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
        DataQualityValidator,
    )

    return (
        DataQualityValidator(load_customers(spark, sf_dir), name="customers")
        .check_completeness(["customer_id", "name", "region"])
        .check_accuracy("positive_tenure", F.col("customer_tenure_days") > 0)
        .report()
    )
