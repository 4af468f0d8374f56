"""Direct coverage for utility layers used indirectly elsewhere:
partitioned sinks and scalar expression helpers."""

import datetime

import pyspark.sql.functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.functions import (
    day_key,
    epoch_day_to_date,
    money,
    safe_div,
)
from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table
from dea05_e2e_kafka_streaming_pipeline_spark.sources.sinks import (
    write_json_partitioned,
    write_parquet_partitioned,
)

from tests.conftest import SF_SMOKE


def test_write_parquet_partitioned_layout_and_file_cap(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    write_parquet_partitioned(
        df, str(tmp_path / "out"), partition_by=["status"], max_records_per_file=100
    )
    dirs = [p.name for p in (tmp_path / "out").iterdir() if p.name.startswith("status=")]
    assert set(dirs) == {"status=O", "status=F", "status=P"}
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == df.count()
    # maxRecordsPerFile honored: no file holds more than 100 rows
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.catalog import file_inventory

    assert all(r.n_rows <= 100 for r in file_inventory(back).collect())


def test_write_json_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    write_json_partitioned(df, str(tmp_path / "j"), partition_by=["tag"])
    back = spark.read.json(str(tmp_path / "j"))
    assert {(r.id, r.tag) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_scalar_helpers(spark):
    df = spark.createDataFrame(
        [(19000, "2024-03-05 10:30:00", 12.345, 10.0, 0.0)],
        "d int, ts string, amt double, num double, zero double",
    ).select(
        epoch_day_to_date("d").alias("date"),
        day_key(F.col("ts").cast("timestamp")).alias("day"),
        money("amt").alias("m"),
        safe_div(F.col("num"), F.col("zero")).alias("div0"),
        safe_div(F.col("num"), F.lit(4.0)).alias("div4"),
    )
    r = df.collect()[0]
    assert r.date == datetime.date(1970, 1, 1) + datetime.timedelta(days=19000)
    assert r.day == "2024-03-05"
    assert str(r.m) == "12.35"  # decimal(18,2), HALF_UP
    assert r.div0 is None  # zero-guard: NULL, not error/inf
    assert r.div4 == 2.5
