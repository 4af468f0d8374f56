from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import (
    load_table,
    read_avro,
    read_csv,
    read_delta,
    read_json,
    read_parquet,
)
from dea05_e2e_kafka_streaming_pipeline_spark.sources.entities import (
    load_customers,
    load_orders,
)
from dea05_e2e_kafka_streaming_pipeline_spark.sources.sinks import (
    write_bucketed_table,
    write_delta,
    write_json_partitioned,
    write_parquet_partitioned,
)

__all__ = [
    "load_table",
    "read_avro",
    "read_csv",
    "read_delta",
    "read_json",
    "read_parquet",
    "load_customers",
    "load_orders",
    "write_bucketed_table",
    "write_delta",
    "write_json_partitioned",
    "write_parquet_partitioned",
]
