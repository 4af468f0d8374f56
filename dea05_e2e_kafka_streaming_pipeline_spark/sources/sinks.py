"""Partitioned lake sinks (SURVEY §2.1 S6, S11-S13).

The reference writes date/region-partitioned Parquet for gold tables
(``enriched/daily_sales_aggregation.py:29-32``) and JSON quarantine
prefixes for failed DQ batches (``curated/data_quality.py:174``). The
engine keeps the same Hive-style partition layout — it is what makes
downstream partition pruning work — and bounds output file counts so a
1000-executor write doesn't produce a million tiny files.

Server-side encryption: the reference's ingestion sink sets
``ServerSideEncryption="AES256"`` per object (boto3,
``ingestion/s3-orders-ingestion.py:54``). On Spark that is a
filesystem-layer concern, not a writer option — for S3A set
``spark.hadoop.fs.s3a.server-side-encryption-algorithm=AES256`` (or
``SSE-KMS`` + key id) on the session and every sink in this module
inherits it; nothing per-write is needed, which is why no function here
takes an encryption parameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Partitioned Parquet write.

    ``maxRecordsPerFile`` caps file size at scale; Hive-style
    ``partitionBy`` preserves downstream static/dynamic partition pruning.
    """
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the co-located-join layout for 100 TB
    fact tables: two tables bucketed on the same key join with NO
    exchange on either side (plan-asserted in
    tests/test_medallion.py::test_bucketed_join_no_shuffle). Bucketing
    requires the catalog (saveAsTable)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def write_delta(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    overwrite_schema: bool = True,
) -> None:
    """Delta sink (SURVEY S12): overwrite + schema evolution +
    partitioning, matching the reference's Delta writes
    (mage-programs/orders_delta_lake.py:53 — ``format("delta")
    .mode("overwrite").option("overwriteSchema","true")``; partitioned
    variants data_quality.py:229-231, gold_aggregations.py:60,
    customer_lifetime_value.py:82).

    Requires delta-spark on the classpath; jar-gated like
    ``read_delta`` so the core engine runs on vanilla Spark."""
    writer = df.write.format("delta").mode(mode)
    if overwrite_schema and mode == "overwrite":
        writer = writer.option("overwriteSchema", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    try:
        writer.save(path)
    except Exception as exc:
        raise RuntimeError(
            "Delta writes need the delta-spark package on the classpath "
            "(configure spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension). "
            f"Underlying error: {exc}"
        ) from exc


def write_json_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """JSON-lines write — quarantine / report sinks (small data only;
    Parquet is the lake format for anything at scale)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
