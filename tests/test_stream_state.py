"""Streaming state-size bounds (round-6 verdict item 8).

The x10 ledger (STREAM_STATE_x10.json, tools/stream_state_probe.py)
measures the same bounds at scale; these tests pin them in CI at toy
scale: state grows with KEYS, never with EVENTS. Each test streams a
corpus whose event count is a large multiple of its key count and
asserts the state-store metrics (or store files) sit at the key bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401  (fixture re-export)


def _state_totals(q) -> list[tuple[int, int]]:
    """(input_rows, state_rows) per micro-batch from recentProgress."""
    out = []
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        if ops:
            out.append(
                (p["numInputRows"], sum(o.get("numRowsTotal", 0) for o in ops))
            )
    return out


def test_dedup_stream_state_rows_bounded_by_keys(spark, tmp_path):
    """600 events over 50 distinct fingerprints in 3 micro-batches —
    the dedup state must hold exactly 50 rows after every batch that
    has seen all keys, and NEVER grow past the key count while the
    duplicate-heavy later batches keep arriving."""
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        dedup_stream,
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    landing = tmp_path / "landing"
    schema_str = "doc_id long, text string"
    # batch 1: all 50 keys; batches 2-3: pure duplicates
    for b in range(3):
        rows = [
            (b * 200 + i, f"content {i % 50}") for i in range(200)
        ]
        spark.createDataFrame(rows, schema_str).coalesce(1).write.mode(
            "append"
        ).json(str(landing / f"b{b}"))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(landing / "*"))
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    batches = _state_totals(q)
    assert sum(i for i, _ in batches) == 600
    assert batches[-1][1] == 50  # state == keys
    assert all(s <= 50 for _, s in batches)  # never event-driven


def test_ks_drift_stream_state_rows_equal_key_count(spark, tmp_path):
    """The KS monitor's state-store rows equal the number of GROUP KEYS
    (event types) — the per-key histogram lives inside the state value
    and is capped by the quantized support, so 3000 events over 3 types
    leave exactly 3 state rows."""
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.stateful import (
        ks_drift_stream,
        ks_reference_from_df,
    )
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType,
    )

    landing = tmp_path / "landing"
    types = ["a", "b", "c"]
    for b in range(3):
        rows = [
            (types[i % 3], round((i % 40) * 0.25, 2)) for i in range(1000)
        ]
        spark.createDataFrame(
            rows, "event_type string, value double"
        ).coalesce(1).write.mode("append").json(str(landing / f"b{b}"))
    ref = ks_reference_from_df(
        spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("c", 3.0)],
            "event_type string, value double",
        ),
        type_col="event_type",
    )
    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(landing / "*"))
    )
    q = (
        ks_drift_stream(stream, ref)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    batches = _state_totals(q)
    assert sum(i for i, _ in batches) == 3000
    assert batches[-1][1] == 3
    assert all(s <= 3 for _, s in batches)


def test_hll_store_rows_bounded_by_keys_across_waves(spark, tmp_path):
    """Two ingest waves (2000 events, 2 keys): the register store's row
    count must be identical after both waves — sketch-sized, O(keys),
    regardless of accumulated event volume."""
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        hll_register_store_sink,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.sources import (
        file_stream,
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    landing = tmp_path / "landing"
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    schema = StructType(
        [StructField("k", StringType()), StructField("v", LongType())]
    )
    rows_per_wave = []
    for w in range(2):
        rows = [("x" if i % 2 else "y", w * 1000 + i) for i in range(1000)]
        spark.createDataFrame(rows, "k string, v long").coalesce(1).write.mode(
            "append"
        ).json(str(landing / f"w{w}"))
        q = hll_register_store_sink(
            file_stream(spark, str(landing / "*"), schema),
            store, ckpt, keys=["k"], value_col="v", p=6, available_now=True,
        )
        assert q.awaitTermination(600)
        rows_per_wave.append(spark.read.parquet(store).count())
    # one row per (key, register): 2 keys x 2^6 registers — and FLAT
    # across waves while events double
    assert rows_per_wave[0] == rows_per_wave[1] == 2 * 64


def test_retractable_gold_epoch_partials_bounded_by_groups(spark, tmp_path):
    """900 CDC inserts over 3 groups in 3 epochs: every epoch's signed
    partial directory holds <= 3 rows (group grain), so total state is
    O(groups x epochs), never O(events)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        read_retractable_gold,
        retractable_gold_sink,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.sources import (
        file_stream,
    )
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    landing = tmp_path / "cdc"
    schema = StructType(
        [
            StructField("op", StringType()),
            StructField("before_grp", StringType()),
            StructField("before_v", DoubleType()),
            StructField("after_grp", StringType()),
            StructField("after_v", DoubleType()),
        ]
    )
    for b in range(3):
        rows = [
            ("c", None, None, f"g{i % 3}", float(i)) for i in range(300)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).json(str(landing / f"b{b}"))
    state = str(tmp_path / "state")
    q = retractable_gold_sink(
        file_stream(spark, str(landing / "*"), schema, max_files_per_trigger=1),
        state, str(tmp_path / "ckpt"),
        cols=["grp", "v"], keys=["grp"], measures=[("total", "v")],
        available_now=True,
    )
    assert q.awaitTermination(600)
    import glob as _glob
    import os as _os

    epochs = sorted(_glob.glob(_os.path.join(state, "epoch=*")))
    assert len(epochs) == 3
    for e in epochs:
        assert spark.read.parquet(e).count() <= 3
    view = read_retractable_gold(spark, state, ["grp"], [("total", "v")])
    assert view.count() == 3


def test_ann_versioned_quantizer_state_constant_bytes(spark, tmp_path):
    """Two vector waves through the versioned ANN sink: the quantizer
    state file stays O(n_centroids x dim) — byte size moves only by the
    psi float's text width — while the index grows with the DATA."""
    import json
    import os
    import random

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.similarity import (
        ann_store_paths,
        ann_store_read,
        ann_store_versions,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        ann_ingest_sink_versioned,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.sources import (
        file_stream,
    )
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    rng = random.Random(5)
    landing = tmp_path / "landing"
    store = str(tmp_path / "store")
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    sizes = []
    for w in range(2):
        rows = [
            (w * 100 + i, [rng.gauss(0, 1) for _ in range(4)])
            for i in range(100)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).json(str(landing / f"w{w}"))
        q = ann_ingest_sink_versioned(
            file_stream(spark, str(landing / "*"), schema),
            store, str(tmp_path / "ckpt"),
            n_centroids=4, n_probe=2, available_now=True,
        )
        assert q.awaitTermination(600)
        v = ann_store_versions(store)[-1]
        _, state_path = ann_store_paths(store, v)
        sizes.append(os.path.getsize(state_path))
        with open(state_path) as f:
            assert len(json.load(f)["centroids"]) == 4
    assert abs(sizes[1] - sizes[0]) <= 64  # psi text width only
    assert ann_store_read(spark, store).count() == 200


def test_ann_store_topk_pinned_version_stable_across_rebuild(spark, tmp_path):
    """Reader contract of rebuild-and-swap: a top-k against a PINNED
    version returns identical rows before and after a rebuild swaps the
    current version, while an unpinned read resolves the new version
    and bit-matches a fresh ivf_topk over the rebuilt index."""
    import random

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.similarity import (
        ann_index_rebuild,
        ann_store_topk,
        ann_store_versions,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        ann_ingest_sink_versioned,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.sources import (
        file_stream,
    )
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    rng = random.Random(23)
    landing = tmp_path / "landing"
    store = str(tmp_path / "store")
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    rows = [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(200)]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").json(
        str(landing / "w0")
    )
    q = ann_ingest_sink_versioned(
        file_stream(spark, str(landing / "*"), schema),
        store, str(tmp_path / "ckpt"),
        n_centroids=4, n_probe=2, available_now=True,
    )
    assert q.awaitTermination(600)
    qv = rows[7][1]
    before = [(r.vec_id, r.score) for r in ann_store_topk(spark, store, qv, k=5).collect()]
    assert len(before) == 5 and before[0][0] == 7  # self is nearest

    ann_index_rebuild(spark, store, n_centroids=4, n_probe=2)
    assert ann_store_versions(store) == [0, 1]
    # pinned read: byte-identical to the pre-rebuild result
    pinned = [(r.vec_id, r.score) for r in ann_store_topk(spark, store, qv, k=5, version=0).collect()]
    assert pinned == before
    # unpinned read resolves v1 and still finds the vector itself
    after = [(r.vec_id, r.score) for r in ann_store_topk(spark, store, qv, k=5).collect()]
    assert after[0][0] == 7
