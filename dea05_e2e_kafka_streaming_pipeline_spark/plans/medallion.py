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

    # ingest-date partitioning (date_column=None → current_timestamp),
    # matching stamp_bronze and the bronze layer convention above —
    # event-date layouts belong to silver/gold, not the landing zone
    bronze_q = ingest_to_lake(
        orders_stream,
        path=paths.bronze,
        checkpoint=f"{checkpoint_root}/bronze",
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
    fmt: str = "parquet",
) -> dict[str, bool | int]:
    """Batch/backfill run of the full pipeline. Returns a small summary
    dict (row counts + gate decision) — no data ever crosses the driver
    beyond the DQ report.

    ``fmt`` picks the lake table format per layer write: ``"parquet"``
    (reference AWS flavor, curated/data_quality.py:170-171) or
    ``"delta"`` (reference Mage flavor — overwrite + overwriteSchema,
    mage-programs/data_quality.py:229-231 / gold_aggregations.py:60 —
    requires delta-spark; raises the jar-gated error otherwise).
    Quarantine stays JSON in both flavors, as in the reference."""
    if fmt not in ("parquet", "delta"):
        raise ValueError(f"unsupported medallion format: {fmt!r}")

    def write_layer(df: DataFrame, path: str, partition_by: list[str]) -> None:
        if fmt == "delta":
            from dea05_e2e_kafka_streaming_pipeline_spark.sources.sinks import (
                write_delta,
            )

            write_delta(df, path, partition_by=partition_by)
        else:
            from dea05_e2e_kafka_streaming_pipeline_spark.sources.sinks import (
                write_parquet_partitioned,
            )

            write_parquet_partitioned(df, path, partition_by=partition_by)

    def read_layer(path: str) -> DataFrame:
        return spark.read.format(fmt).load(path)

    write_layer(stamp_bronze(orders_raw), paths.bronze, ["date"])
    bronze = read_layer(paths.bronze).drop(
        "ingest_time", "source_file", "ingestion_layer", "date"
    )

    gate_ok = default_orders_validator(bronze, customers).gate(
        lambda df: write_layer(df, paths.silver, ["order_date"]),
        lambda df: df.write.mode("overwrite").json(paths.quarantine),
    )
    summary: dict[str, bool | int] = {"gate_passed": gate_ok}
    if not gate_ok:
        return summary

    silver = read_layer(paths.silver)
    daily = build_daily_sales(silver, customers, with_processing_ts=True)
    write_layer(daily, paths.gold_daily_sales, ["date", "region"])
    clv = build_clv(silver, customers, with_processing_ts=True)
    write_layer(clv, paths.gold_clv, ["region"])

    summary["silver_rows"] = silver.count()
    summary["daily_sales_rows"] = read_layer(paths.gold_daily_sales).count()
    summary["clv_rows"] = read_layer(paths.gold_clv).count()
    return summary
