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


def test_scd2_history_suppression_intervals_versions(spark):
    """No-op updates collapse; intervals are half-open and chained;
    the last surviving version is current."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import scd2_history

    df = spark.createDataFrame(
        [
            (1, "A", 10, 100),
            (1, "A", 20, 101),  # no-op update: suppressed
            (1, "B", 30, 102),
            (1, "A", 40, 103),  # back to A: NEW version, not merged
            (2, "X", 10, 104),
        ],
        "k long, attr string, ts long, seq long",
    )
    rows = scd2_history(
        df, key_col="k", attr_cols=("attr",), seq_cols=("ts", "seq")
    ).collect()
    k1 = sorted((r for r in rows if r.k == 1), key=lambda r: r.version)
    assert [(r.attr, r.valid_from, r.valid_to, r.version, r.is_current) for r in k1] == [
        ("A", 10, 30, 1, False),
        ("B", 30, 40, 2, False),
        ("A", 40, None, 3, True),
    ]
    (k2,) = [r for r in rows if r.k == 2]
    assert (k2.version, k2.is_current, k2.valid_to) == (1, True, None)


def test_scd2_history_delete_closes_interval(spark):
    """A delete closes the open interval without emitting a version;
    a later re-insert of the SAME image starts a fresh version (the
    suppression lag never compares across the delete marker). Version
    numbering keeps the delete epoch's gap."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import scd2_history

    df = spark.createDataFrame(
        [
            (1, "A", 10, False),
            (1, None, 20, True),  # delete
            (1, "A", 30, False),  # re-insert of identical image
        ],
        "k long, attr string, ts long, is_del boolean",
    )
    rows = sorted(
        scd2_history(
            df,
            key_col="k",
            attr_cols=("attr",),
            seq_cols=("ts",),
            delete_col="is_del",
        ).collect(),
        key=lambda r: r.version,
    )
    assert [(r.attr, r.valid_from, r.valid_to, r.version, r.is_current) for r in rows] == [
        ("A", 10, 20, 1, False),
        ("A", 30, None, 3, True),  # version 2 was the delete epoch
    ]


def test_scd2_history_single_exchange(spark):
    """The lag/lead/row_number windows must share ONE shuffle."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import scd2_history

    df = spark.range(100).selectExpr(
        "id % 10 as k", "cast(id % 3 as string) attr", "id as ts"
    )
    plan = (
        scd2_history(df, key_col="k", attr_cols=("attr",), seq_cols=("ts",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_customer_priority_scd2_matches_oracle(spark, duck):
    from dea05_e2e_kafka_streaming_pipeline_spark.queries import oracles, queries

    from tests.conftest import SF_DIR, assert_matches_oracle

    assert_matches_oracle(
        queries()["customer_priority_scd2"](spark, SF_DIR),
        duck,
        oracles()["customer_priority_scd2"],
    )


def test_snapshot_diff_ops_and_null_safety(spark):
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 5.0), (3, "c", None), (4, "d", 1.0)],
        "k long, attr string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),    # unchanged: dropped
         (2, "b", 5.0),     # NULL -> value: update
         (3, "c", None),    # NULL == NULL: unchanged, dropped
         (5, "e", 9.0)],    # new key: insert; key 4 gone: delete
        "k long, attr string, v double",
    )
    rows = {r.k: r for r in snapshot_diff(old, new, key_cols=("k",)).collect()}
    assert {k: r.op for k, r in rows.items()} == {2: "u", 4: "d", 5: "i"}
    assert rows[2].attr == "b"       # after-image for updates
    assert rows[4].attr == "d"       # before-image for deletes
    assert rows[5].v == 9.0


def test_snapshot_diff_roundtrip_through_merge(spark):
    """CDF closure: applying the emitted diff to the OLD snapshot with
    the CDC merge operator must reconstruct the NEW snapshot exactly."""
    import pyspark.sql.functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import (
        apply_cdc_changes,
        snapshot_diff,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    new = load_table(spark, "/root/testdata/sf0.001", "orders").select(*cols)
    old = new.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice")),
    )
    changes = (
        snapshot_diff(old, new, key_cols=("o_orderkey",))
        .withColumnRenamed("op", "_cdc_op")
        .withColumn("_cdc_ts_ms", F.lit(1).cast("long"))
    )
    rebuilt = apply_cdc_changes(old, changes, key="o_orderkey")
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_snapshot_diff_matches_oracle(spark, duck):
    from dea05_e2e_kafka_streaming_pipeline_spark.queries import oracles, queries

    from tests.conftest import SF_DIR, assert_matches_oracle

    assert_matches_oracle(
        queries()["snapshot_diff_orders"](spark, SF_DIR),
        duck,
        oracles()["snapshot_diff_orders"],
    )


def test_scd2_snapshot_point_in_time(spark):
    """AS OF semantics over the history: the containing interval wins;
    keys deleted before (or born after) the snapshot produce no row;
    snapshot at exactly valid_from includes the version (half-open)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import (
        scd2_history,
        scd2_snapshot,
    )

    df = spark.createDataFrame(
        [
            (1, "A", 10, False), (1, "B", 30, False),   # 1: A@[10,30) B@[30,∞)
            (2, "X", 15, False), (2, None, 25, True),   # 2: deleted at 25
            (3, "Z", 40, False),                        # 3: born later
        ],
        "k long, attr string, ts long, is_del boolean",
    )
    hist = scd2_history(
        df, key_col="k", attr_cols=("attr",), seq_cols=("ts",),
        delete_col="is_del",
    )
    snap = {r.k: r.attr for r in scd2_snapshot(hist, 30).collect()}
    assert snap == {1: "B"}  # half-open: B from exactly 30; 2 deleted; 3 unborn
    snap20 = {r.k: r.attr for r in scd2_snapshot(hist, 20).collect()}
    assert snap20 == {1: "A", 2: "X"}
    snap99 = {r.k: r.attr for r in scd2_snapshot(hist, 99).collect()}
    assert snap99 == {1: "B", 3: "Z"}
