"""Reference-entity views over the driver testdata.

The engine's canonical entities are ``orders`` and ``customers``
(reference curated/data_quality.py:9-24). The driver's testdata is a
TPC-H-ish star schema; FIXTURES.md §4 defines the column mapping used for
all oracle-checked queries:

    orders.order_id        ← orders.o_orderkey
    orders.customer_id     ← orders.o_custkey
    orders.order_amount    ← orders.o_totalprice
    orders.order_date      ← orders.o_orderdate
    customers.customer_id  ← customer.c_custkey
    customers.name         ← customer.c_name
    customers.region       ← customer.c_mktsegment
    customers.customer_tenure_days ← c_custkey % 100 + 1 (synthesized)

These are pure projections — Catalyst collapses them into the parquet
scan (column pruning), so the mapping layer is free at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table


def load_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders entity (reference schema) from testdata ``orders.parquet``."""
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_totalprice").alias("order_amount"),
        F.col("o_custkey").alias("customer_id"),
    )


def load_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers entity (reference schema) from testdata ``customer.parquet``."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("name"),
        # deterministic synthesized email (testdata has none)
        F.concat(
            F.lower(F.regexp_replace(F.col("c_name"), "[^A-Za-z0-9]", ".")),
            F.lit("@example.com"),
        ).alias("email"),
        F.col("c_mktsegment").alias("region"),
        (F.col("c_custkey") % 100 + 1).cast("int").alias("customer_tenure_days"),
    )


# The same mapping as ANSI SQL fragments, for composing DuckDB oracle
# queries against identical inputs.
ORDERS_SQL = (
    "SELECT o_orderkey AS order_id, CAST(o_orderdate AS DATE) AS order_date, "
    "o_totalprice AS order_amount, o_custkey AS customer_id FROM orders"
)
CUSTOMERS_SQL = (
    "SELECT c_custkey AS customer_id, c_name AS name, "
    "lower(regexp_replace(c_name, '[^A-Za-z0-9]', '.', 'g')) || '@example.com' AS email, "
    "c_mktsegment AS region, "
    "CAST(c_custkey % 100 + 1 AS INT) AS customer_tenure_days FROM customer"
)
