"""CDC operators: envelope flatten, delete handling, epoch-day decode,
decimal amounts — semantics from reference curated/dq_kafka.py:148-179,
validated against the Debezium envelope shape of the reference's Avro
fixtures (testing/streaming.public.*.avro)."""

import datetime

import pyspark.sql.functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import (
    decode_cdc_orders,
    decode_epoch_days,
    normalize_cdc,
)
from dea05_e2e_kafka_streaming_pipeline_spark.schemas import CDC_ORDERS_ENVELOPE


def _envelope_df(spark):
    rows = [
        # insert: after populated
        (
            None,
            (1, 19000, None, 7),  # 19000 days ≈ 2022-01-08
            None,
            "c",
            1000,
            None,
        ),
        # update
        ((2, 18000, None, 8), (2, 18001, None, 8), None, "u", 2000, None),
        # delete: after is NULL
        ((3, 17000, None, 9), None, None, "d", 3000, None),
    ]
    return spark.createDataFrame(rows, CDC_ORDERS_ENVELOPE)


def test_normalize_flattens_and_drops_deletes(spark):
    flat = normalize_cdc(_envelope_df(spark))
    rows = flat.orderBy("order_id").collect()
    assert [r.order_id for r in rows] == [1, 2]
    assert flat.columns == ["order_id", "order_date", "order_amount", "customer_id"]


def test_normalize_keep_meta_and_deletes(spark):
    flat = normalize_cdc(_envelope_df(spark), keep_meta=True, drop_deletes=False)
    rows = flat.orderBy("_cdc_ts_ms").collect()
    assert [r._cdc_op for r in rows] == ["c", "u", "d"]
    # delete rows surface their key from the `before` image
    assert rows[2].order_id == 3


def test_normalize_passthrough_on_flat_input(spark):
    df = spark.createDataFrame([(1, 2)], "order_id int, customer_id int")
    assert normalize_cdc(df) is df


def test_epoch_day_decode(spark):
    df = spark.createDataFrame([(0,), (19000,), (None,)], "d int")
    out = decode_epoch_days(df, ["d"]).collect()
    assert out[0].d == datetime.date(1970, 1, 1)
    assert out[1].d == datetime.date(1970, 1, 1) + datetime.timedelta(days=19000)
    assert out[2].d is None


def test_decode_cdc_orders_end_to_end(spark):
    out = decode_cdc_orders(_envelope_df(spark)).orderBy("order_id").collect()
    assert out[0].order_date == datetime.date(1970, 1, 1) + datetime.timedelta(
        days=19000
    )
    assert out[1].order_date == datetime.date(1970, 1, 1) + datetime.timedelta(
        days=18001
    )
    # decimal(10,2) surfaced as double (batch-path dtype)
    assert dict(decode_cdc_orders(_envelope_df(spark)).dtypes)["order_amount"] == "double"
