"""XML interchange format (sources/registry.py:read_xml/write_xml) —
Spark 4's built-in XML source (spark-xml folded into core, no extra
jar): typed round-trip fidelity, custom row/root tags, nested-struct
records, and the mandatory-schema read policy shared with read_json."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from dea05_e2e_kafka_streaming_pipeline_spark.sources.entities import load_orders
from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import (
    read_xml,
    write_xml,
)

SF = "/root/testdata/sf0.001"


def test_xml_round_trip_orders(spark, tmp_path):
    out = str(tmp_path / "orders_xml")
    df = load_orders(spark, SF).limit(50)
    write_xml(df, out, row_tag="order", root_tag="orders")
    back = read_xml(spark, out, df.schema, row_tag="order")
    assert back.schema == df.schema
    want = sorted(map(tuple, df.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_xml_nested_struct_round_trip(spark, tmp_path):
    """Nested records map to nested elements — the shape real B2B/
    regulatory feeds use — and must survive a typed round-trip."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "customer",
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("segment", T.StringType()),
                    ]
                ),
            ),
            T.StructField("amount", T.DoubleType()),
            T.StructField("placed", T.DateType()),
        ]
    )
    rows = [
        (1, ("Alice", "BUILDING"), 123.45, datetime.date(1995, 1, 2)),
        (2, ("Bob", "MACHINERY"), 0.5, datetime.date(1996, 3, 4)),
        (3, (None, "AUTOMOBILE"), None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "nested_xml")
    write_xml(df, out, row_tag="rec", root_tag="feed")
    back = read_xml(spark, out, schema, row_tag="rec")
    assert back.schema == schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_xml_read_parallelizes(spark, tmp_path):
    """Multiple part files -> multiple input partitions (the reader
    must not serialize the whole feed through one task)."""
    out = str(tmp_path / "many_xml")
    df = load_orders(spark, SF).repartition(4)
    write_xml(df, out, row_tag="order", root_tag="orders")
    back = read_xml(spark, out, df.schema, row_tag="order")
    assert back.rdd.getNumPartitions() >= 2
    assert back.count() == df.count()


def test_xml_quarantine_splits_malformed_rows(spark, tmp_path):
    """A type-mismatched record must land in the bad split with its
    raw text, not fold in as an all-NULL row."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import (
        read_xml_quarantine,
    )

    xml = (
        "<rows>"
        "<row><id>1</id><amount>10.5</amount></row>"
        "<row><id>oops</id><amount>2.5</amount></row>"
        "<row><id>3</id><amount>7.25</amount></row>"
        "</rows>"
    )
    src = tmp_path / "feed"
    src.mkdir()
    (src / "part-0.xml").write_text(xml)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    good, bad = read_xml_quarantine(spark, str(src), schema, row_tag="row")
    assert sorted((r.id, r.amount) for r in good.collect()) == [
        (1, 10.5),
        (3, 7.25),
    ]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "oops" in bad_rows[0].corrupt_record
