from dea05_e2e_kafka_streaming_pipeline_spark.streaming.sources import (
    file_stream,
    kafka_json_stream,
    synthetic_customers_stream,
    synthetic_orders_stream,
)
from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
    dq_gated_sink,
    ingest_to_lake,
    windowed_event_stats,
)

__all__ = [
    "file_stream",
    "kafka_json_stream",
    "synthetic_customers_stream",
    "synthetic_orders_stream",
    "dq_gated_sink",
    "ingest_to_lake",
    "windowed_event_stats",
]
