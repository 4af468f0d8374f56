"""dea05_e2e_kafka_streaming_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capability surface of the
reference pipeline ``ramsjenu/DEA05-E2E-Kafka_Streaming-Pipeline`` (a Kafka →
object-store medallion lakehouse over an ``orders`` ⋈ ``customers`` schema),
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Design principles (see SURVEY.md §7):

- DataFrame / SQL first: every operator is a thin, typed composition of
  Catalyst-optimizable expressions. No RDDs, no driver-side loops over data.
- One Spark job where the reference ran many (e.g. the data-quality suite
  folds all checks into a single aggregate).
- Structured Streaming replaces the reference's hand-rolled Kafka
  consumer/producer loops (checkpointed, exactly-once to file sinks).
- Pandas UDFs (Arrow) only where built-ins genuinely cannot express the
  semantics; never row-at-a-time Python UDFs on the hot path.
"""

from dea05_e2e_kafka_streaming_pipeline_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
