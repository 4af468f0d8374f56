"""The end-to-end medallion pipeline — the reference's complete story as
one composable engine flow.

Reference lifecycle (SURVEY §3): Kafka → bronze landing (JSON, date-
partitioned, ingest_time-stamped) → silver via the DQ gate (curated vs
quarantine) → gold transforms (daily sales, CLV). Here each layer is a
function over DataFrames so the same code runs batch (backfill) or under
``foreachBatch`` in streaming, and every boundary is a partitioned lake
path.

Layer conventions (what downstream pruning relies on):

- bronze: partitioned by ingest ``date``, raw schema + lineage columns
  (``ingest_time``, ``source_file``, ``ingestion_layer`` — reference
  mage-programs/orders_delta_lake.py:48-50).
- silver: DQ-gated, partitioned by the entity's natural date where one
  exists (orders: ``order_date``) — reference curated/data_quality.py:170.
- gold: query-shaped outputs partitioned by their group keys —
  reference enriched/daily_sales_aggregation.py:29-32.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
    DataQualityValidator,
)
from dea05_e2e_kafka_streaming_pipeline_spark.plans.gold import (
    build_clv,
    build_daily_sales,
)


@dataclass
class MedallionPaths:
    bronze: str
    silver: str
    quarantine: str
    gold_daily_sales: str
    gold_clv: str


def stamp_bronze(df: DataFrame, layer: str = "bronze") -> DataFrame:
    """Lineage stamping on landing (reference orders_delta_lake.py:42-50):
    ingest_time, source_file, ingestion_layer, plus the ingest date
    partition column."""
    return (
        df.withColumn("ingest_time", F.current_timestamp())
        .withColumn("source_file", F.input_file_name())
        .withColumn("ingestion_layer", F.lit(layer))
        .withColumn("date", F.date_format(F.current_timestamp(), "yyyy-MM-dd"))
    )


def default_orders_validator(
    orders: DataFrame, customers: DataFrame
) -> DataQualityValidator:
    """The reference's orders DQ suite (curated/data_quality.py:137-157)."""
    return (
        DataQualityValidator(orders, name="orders")
        .check_completeness(["order_id", "order_date", "order_amount", "customer_id"])
        .check_accuracy("positive_amount", F.col("order_amount") > 0)
        .check_accuracy("date_not_future", F.col("order_date") <= F.current_date())
        .check_consistency("orders_customer_fk", customers, "customer_id")
    )


def run_medallion_stream(
    orders_stream: DataFrame,
    customers: DataFrame,
    paths: MedallionPaths,
    checkpoint_root: str,
    available_now: bool = False,
    trigger_seconds: int | None = 5,
):
    """The reference's E1+E2 as ONE continuous checkpointed flow:
    stream → bronze landing (lineage-stamped, date-partitioned) and
    stream → DQ-gated silver/quarantine, each with its own checkpoint.
    Gold stays a periodic batch over silver (run_medallion_batch's tail
    or a scheduled job) — aggregation freshness is a batch cadence
    decision, not a per-record one. Returns the two StreamingQueries.
    """
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        dq_gated_sink,
        ingest_to_lake,
    )

    bronze_q = ingest_to_lake(
        orders_stream,
        path=paths.bronze,
        checkpoint=f"{checkpoint_root}/bronze",
        date_column="order_date",
        available_now=available_now,
        trigger_seconds=trigger_seconds,
    )
    silver_q = dq_gated_sink(
        orders_stream,
        validator_builder=lambda df: default_orders_validator(df, customers),
        curated_path=paths.silver,
        quarantine_path=paths.quarantine,
        checkpoint=f"{checkpoint_root}/silver",
        available_now=available_now,
        trigger_seconds=trigger_seconds,
    )
    return bronze_q, silver_q


def run_medallion_batch(
    spark: SparkSession,
    orders_raw: DataFrame,
    customers: DataFrame,
    paths: MedallionPaths,
) -> dict[str, bool | int]:
    """Batch/backfill run of the full pipeline. Returns a small summary
    dict (row counts + gate decision) — no data ever crosses the driver
    beyond the DQ report."""
    stamp_bronze(orders_raw).write.mode("overwrite").partitionBy("date").parquet(
        paths.bronze
    )
    bronze = spark.read.parquet(paths.bronze).drop(
        "ingest_time", "source_file", "ingestion_layer", "date"
    )

    gate_ok = default_orders_validator(bronze, customers).gate(
        lambda df: df.write.mode("overwrite")
        .partitionBy("order_date")
        .parquet(paths.silver),
        lambda df: df.write.mode("overwrite").json(paths.quarantine),
    )
    summary: dict[str, bool | int] = {"gate_passed": gate_ok}
    if not gate_ok:
        return summary

    silver = spark.read.parquet(paths.silver)
    daily = build_daily_sales(silver, customers, with_processing_ts=True)
    daily.write.mode("overwrite").partitionBy("date", "region").parquet(
        paths.gold_daily_sales
    )
    clv = build_clv(silver, customers, with_processing_ts=True)
    clv.write.mode("overwrite").partitionBy("region").parquet(paths.gold_clv)

    summary["silver_rows"] = silver.count()
    summary["daily_sales_rows"] = spark.read.parquet(paths.gold_daily_sales).count()
    summary["clv_rows"] = spark.read.parquet(paths.gold_clv).count()
    return summary
