"""General analytics plans beyond the reference's two gold queries —
the OLAP shapes a lakehouse engine must cover (sorts, top-k per group,
multi-way star joins, wide aggregate sweeps), all Catalyst-native.

Determinism discipline matches plans/gold.py: monetary/measure sums
aggregate as exact decimals and surface as doubles; orderings always
carry a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem: filter on ship
    date (pushed to the parquet scan) → groupBy(returnflag, linestatus)
    → 8 aggregates in one partial+final hash agg.

    Decimal typing per measure keeps every product exact:
    price(12,2) × (1−disc)(4,2) → (17,4); × (1+tax)(4,2) → (22,6).
    """
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    disc_price = price * (F.lit(1).cast("decimal(4,2)") - disc)
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + tax)
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_customers_per_region(
    orders: DataFrame, customers: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k customers by lifetime value within each region — the
    ranking-window capability the reference imported but never used
    (enriched/custome_lifetime_value.py:1-2). One shuffle for the
    per-customer aggregate, broadcast join to the dimension, one
    shuffle for the per-region window. Ties break on customer_id."""
    lv = orders.groupBy("customer_id").agg(
        F.sum(F.col("order_amount").cast("decimal(18,2)"))
        .cast("double")
        .alias("lifetime_value")
    )
    joined = lv.join(F.broadcast(customers.select("customer_id", "region")), "customer_id")
    w = Window.partitionBy("region").orderBy(
        F.desc("lifetime_value"), F.col("customer_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("region", "rank", "customer_id", "lifetime_value")
    )


def revenue_by_geo(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue rolled up the real star-schema geography chain
    (orders → customer → nation → region). The two geo dims broadcast;
    customer broadcasts at test scale and hash-joins at 100 TB — either
    way the only unavoidable shuffle is the final group-by, whose key
    cardinality is |region|."""
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
