"""Catalog registration + file inventory operators (SURVEY §2.1 S15/S17)."""

import pyspark.sql.functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.sources.catalog import (
    file_inventory,
    register_table,
)
from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

from tests.conftest import SF_SMOKE


def test_register_table_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_tbl")
    df.write.mode("overwrite").parquet(path)
    register_table(spark, "lake", "orders_t", path)
    back = spark.table("lake.orders_t")
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    assert ("lake", "orders_t") in [
        (t.namespace[0] if t.namespace else "", t.name)
        for t in spark.catalog.listTables("lake")
    ]


def test_file_inventory_counts(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "orders")
    # write 4 files so the inventory has something to enumerate
    df.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "multi"))
    inv = file_inventory(spark.read.parquet(str(tmp_path / "multi"))).collect()
    assert len(inv) == 4
    assert sum(r.n_rows for r in inv) == df.count()
    assert all(r.file.endswith(".parquet") for r in inv)


def test_jar_gated_paths_raise_cleanly(spark, tmp_path):
    """Avro/Delta need jars absent from this container; the registry
    must surface actionable errors, not raw JVM stack traces."""
    import pytest

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import (
        read_avro,
        read_delta,
    )

    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "nope.avro"))
    with pytest.raises(RuntimeError, match="delta"):
        read_delta(spark, str(tmp_path / "nope_delta"))
