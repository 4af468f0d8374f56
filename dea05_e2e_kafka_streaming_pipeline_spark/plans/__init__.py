from dea05_e2e_kafka_streaming_pipeline_spark.plans.gold import (
    build_clv,
    build_daily_sales,
)

__all__ = ["build_clv", "build_daily_sales"]
