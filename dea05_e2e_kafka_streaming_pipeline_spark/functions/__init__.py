from dea05_e2e_kafka_streaming_pipeline_spark.functions.scalars import (
    day_key,
    epoch_day_to_date,
    money,
    safe_div,
)

__all__ = ["day_key", "epoch_day_to_date", "money", "safe_div"]
