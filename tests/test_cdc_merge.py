"""CDC merge (MERGE INTO emulation) + salted-join equivalence."""

import pyspark.sql.functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import (
    apply_cdc_changes,
    normalize_cdc,
)
from dea05_e2e_kafka_streaming_pipeline_spark.operators.skew import salted_join
from dea05_e2e_kafka_streaming_pipeline_spark.schemas import CDC_ORDERS_ENVELOPE


def test_apply_cdc_changes_upsert_delete_outoforder(spark):
    target = spark.createDataFrame(
        [(1, 100, None, 7), (2, 200, None, 8), (3, 300, None, 9)],
        "order_id int, order_date int, order_amount decimal(10,2), customer_id int",
    )
    envelope = spark.createDataFrame(
        [
            # update order 1 twice, OUT OF ORDER: ts 2000 then 1000
            (None, (1, 110, None, 7), None, "u", 2000, None),
            (None, (1, 105, None, 7), None, "u", 1000, None),
            # delete order 2 (key only in `before`)
            ((2, 200, None, 8), None, None, "d", 1500, None),
            # insert order 4
            (None, (4, 400, None, 5), None, "c", 1200, None),
        ],
        CDC_ORDERS_ENVELOPE,
    )
    changes = normalize_cdc(envelope, keep_meta=True, drop_deletes=False)
    merged = apply_cdc_changes(target, changes, key="order_id")
    state = {r.order_id: r.order_date for r in merged.collect()}
    assert state == {1: 110, 3: 300, 4: 400}  # latest-update wins, 2 deleted


def test_apply_cdc_delete_then_reinsert_same_ts_order(spark):
    """At equal ts_ms, delete wins over upsert (documented tie-break)."""
    target = spark.createDataFrame(
        [(1, 100, None, 7)],
        "order_id int, order_date int, order_amount decimal(10,2), customer_id int",
    )
    envelope = spark.createDataFrame(
        [
            ((1, 100, None, 7), None, None, "d", 1000, None),
            (None, (1, 101, None, 7), None, "u", 1000, None),
        ],
        CDC_ORDERS_ENVELOPE,
    )
    changes = normalize_cdc(envelope, keep_meta=True, drop_deletes=False)
    merged = apply_cdc_changes(target, changes, key="order_id")
    assert merged.count() == 0


def test_salted_join_equals_plain_join(spark):
    # heavily skewed fact: 80% of rows on one key
    fact = spark.range(2000).select(
        F.when(F.col("id") % 5 != 0, F.lit(1)).otherwise(F.col("id") % 50)
        .cast("int")
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(50).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = fact.join(dim, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).collect()[0]
    salted = salted_join(fact, dim, "k", num_salts=8).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).collect()[0]
    assert (plain.n, plain.sv, plain.sw) == (salted.n, salted.sv, salted.sw)


def test_normalize_preserves_set_to_null_updates(spark):
    """An update that legitimately sets a field to NULL must flatten to
    NULL — only whole-struct-NULL (deletes) fall back to `before`."""
    from decimal import Decimal

    envelope = spark.createDataFrame(
        [((1, 100, Decimal("5.00"), 7), (1, 100, None, 7), None, "u", 1000, None)],
        CDC_ORDERS_ENVELOPE,
    )
    row = normalize_cdc(envelope).collect()[0]
    assert row.order_amount is None  # NOT resurrected from before


def test_salted_join_rejects_right_outer(spark):
    import pytest

    fact = spark.range(10).selectExpr("cast(id as int) k", "id v")
    dim = spark.range(5).selectExpr("cast(id as int) k")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(fact, dim, "k", how="right")
