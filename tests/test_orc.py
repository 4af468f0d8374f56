"""ORC lake format (sources/registry.py:read_orc,
sources/sinks.py:write_orc_partitioned): round-trip fidelity, Hive
partition layout, and the same optimizer guarantees the parquet path is
plan-tested for — predicate pushdown and partition pruning must reach
the ORC scan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.sources.entities import load_orders
from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import read_orc
from dea05_e2e_kafka_streaming_pipeline_spark.sources.sinks import (
    write_orc_partitioned,
)

SF = "/root/testdata/sf0.001"


def _write_sample(spark, path: str):
    df = load_orders(spark, SF).withColumn(
        "order_year", F.year("order_date").cast("string")
    )
    write_orc_partitioned(df, path, partition_by=["order_year"])
    return df


def test_orc_round_trip(spark, tmp_path):
    out = str(tmp_path / "orders_orc")
    df = _write_sample(spark, out)
    # partition-column type inference reads "order_year=1995" back as
    # int — normalize to the written string type for value comparison
    back = read_orc(spark, out).withColumn(
        "order_year", F.col("order_year").cast("string")
    )
    assert sorted(back.columns) == sorted(df.columns)
    want = sorted(map(tuple, df.select(*sorted(df.columns)).collect()))
    got = sorted(map(tuple, back.select(*sorted(df.columns)).collect()))
    assert got == want
    # Hive-style partition dirs on disk
    years = [d for d in os.listdir(out) if d.startswith("order_year=")]
    assert len(years) > 1


def test_orc_partition_pruning_and_pushdown(spark, tmp_path):
    out = str(tmp_path / "orders_orc2")
    _write_sample(spark, out)
    pruned = read_orc(spark, out).filter(
        (F.col("order_year") == "1995") & (F.col("order_amount") > 100000)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter prunes directories; amount predicate pushes into
    # the ORC stripe indexes
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters", 1)[1][:200]
    assert "PushedFilters: [IsNotNull(order_amount), GreaterThan(order_amount" in plan
    n_all = read_orc(spark, out).count()
    n_pruned = pruned.count()
    assert 0 < n_pruned < n_all


def test_csv_quarantine_splits_bad_rows(spark, tmp_path):
    """CSV parse-level quarantine: type-mismatched and ragged lines land
    raw on the bad side; well-formed rows parse typed on the good side."""
    from pyspark.sql import types as T

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import (
        read_csv_quarantine,
    )

    p = tmp_path / "seed.csv"
    p.write_text(
        "order_id,order_amount\n"
        "1,10.5\n"
        "not_a_number,99.0\n"
        "2,20.0\n"
    )
    schema = T.StructType(
        [
            T.StructField("order_id", T.IntegerType()),
            T.StructField("order_amount", T.DoubleType()),
        ]
    )
    good, bad = read_csv_quarantine(spark, str(p), schema)
    assert sorted((r.order_id, r.order_amount) for r in good.collect()) == [
        (1, 10.5),
        (2, 20.0),
    ]
    bad_rows = [r.corrupt_record for r in bad.collect()]
    assert bad_rows == ["not_a_number,99.0"]


def test_backfill_rewrites_only_present_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.sinks import (
        backfill_partitions,
        write_parquet_partitioned,
    )

    out = str(tmp_path / "gold")
    base = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 3)],
        "day string, v int",
    )
    write_parquet_partitioned(base, out, partition_by=["day"])
    # backfill day 2 with corrected values; days 1 and 3 must survive
    fix = spark.createDataFrame([("2024-01-02", 20)], "day string, v int")
    backfill_partitions(fix, out, ["day"])
    # partition-type inference reads day back as DATE; stringify
    got = {
        str(r.day): r.v for r in spark.read.parquet(out).collect()
    }
    assert got == {"2024-01-01": 1, "2024-01-02": 20, "2024-01-03": 3}
    # idempotent: running the same backfill again changes nothing
    backfill_partitions(fix, out, ["day"])
    assert {str(r.day): r.v for r in spark.read.parquet(out).collect()} == got


def test_export_jsonl_shards_manifest(spark, tmp_path):
    import json
    import os

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.entities import (
        load_orders,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.sinks import (
        export_jsonl_shards,
    )

    out = str(tmp_path / "shards")
    df = load_orders(spark, "/root/testdata/sf0.001").repartition(2)
    manifest = export_jsonl_shards(df, out, max_records_per_file=300)
    rows = manifest.collect()
    assert len(rows) >= 5  # 1500 rows / 300 per file, ≥2 partitions
    assert sum(r.n_rows for r in rows) == df.count()
    assert all(r.size_bytes > 0 for r in rows)
    assert all(".json.gz" in r.file for r in rows)
    with open(os.path.join(out, "_manifest.jsonl")) as f:
        lines = [json.loads(line) for line in f]
    assert sum(r["n_rows"] for r in lines) == df.count()
