from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
    DataQualityValidator,
)
from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import (
    decode_cdc_orders,
    normalize_cdc,
)

__all__ = ["DataQualityValidator", "decode_cdc_orders", "normalize_cdc"]
