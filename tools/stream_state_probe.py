#!/usr/bin/env python
"""Stream-state-at-scale probe (round-6 verdict item 8).

The streaming paths are correctness-tested at toy scale; this tool
replays an x10-sized stream through each stateful pipeline and records
STATE SIZE PER MICRO-BATCH, proving the production claim that state
growth is bounded by KEYS (distinct fingerprints / types / groups /
registers), never by EVENTS:

- ``dedup_stream``      — x10 documents landed TWICE (100k events,
  ~50k distinct fingerprints): state rows must equal distinct keys and
  stay FLAT through the entire duplicate second pass.
- ``ks_drift_stream``   — 1M x10 events, values quantized to 2dp:
  state rows = #event types (the histogram lives inside each key's
  state value); memory saturates at the distinct quantized support
  (~49k values) and stops growing while events keep arriving.
- ``hll_register_store_sink`` — 1M events in waves: the register store
  stays sketch-sized (≤ keys · 2^p rows) while events accumulate.
- ``retractable_gold_sink``   — CDC stream over x10 orders (insert
  waves + an update/delete wave), month-grain groups: each epoch's
  signed partials are bounded by TOUCHED GROUPS, and the folded view
  by live groups.
- ``ann_ingest_sink_versioned`` — 20k x10 vectors in waves: the
  quantizer state file is O(n_centroids · dim) bytes and CONSTANT;
  the index itself is data (one row per admitted vector), not state.

Metrics come from each query's ``recentProgress`` (stateOperators:
numRowsTotal / memoryUsedBytes) for state-store pipelines, and from
the store files themselves for foreachBatch sinks (read between
availableNow waves — an honest per-batch ledger without hooks).

Writes STREAM_STATE_x10.json next to the repo root; every section
carries a ``bounded`` verdict the committed artifact asserts, and
tests/test_stream_state.py pins the same bounds at toy scale in CI.

Usage:  python tools/stream_state_probe.py [--sf-dir testdata_x10/sf1.0]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _progress_state(q) -> list[dict]:
    """Per-batch (input rows, state rows, state bytes) from a finished
    query's recentProgress."""
    out = []
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        out.append(
            {
                "batch": p["batchId"],
                "input_rows": p["numInputRows"],
                "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
                "state_bytes": sum(o.get("memoryUsedBytes", 0) for o in ops),
            }
        )
    return out


def _dir_stats(spark, path: str) -> tuple[int, int]:
    """(rows, bytes) of a parquet store directory."""
    n = spark.read.parquet(path).count()
    size = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(".")
    )
    return n, size


def probe_dedup_stream(spark, sf_dir: str, work: str) -> dict:
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.dedup import dedup_exact
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        dedup_stream,
    )

    docs_dir = os.path.join(sf_dir, "documents.parquet")
    landing = os.path.join(work, "dedup_landing")
    os.makedirs(landing)
    # land every file TWICE (second copy renamed): pass 2 is 100%
    # duplicates, so any state growth there would be event-driven
    parts = sorted(glob.glob(os.path.join(docs_dir, "part-*.parquet")))
    for i, p in enumerate(parts):
        shutil.copy(p, os.path.join(landing, f"a{i:03d}.parquet"))
    for i, p in enumerate(parts):
        shutil.copy(p, os.path.join(landing, f"b{i:03d}.parquet"))
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 4)
        .load(landing)
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(work, "dedup_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(1200)
    batches = _progress_state(q)
    docs = spark.read.parquet(docs_dir)
    n_keys = dedup_exact(docs).count()
    n_events = sum(b["input_rows"] for b in batches)
    final_rows = batches[-1]["state_rows"]
    return {
        "pipeline": "dedup_stream",
        "bound": "state rows == distinct content fingerprints",
        "n_events": n_events,
        "n_keys": n_keys,
        "final_state_rows": final_rows,
        "batches": batches,
        "bounded": final_rows == n_keys and n_events >= 2 * n_keys,
    }


def probe_ks_drift(spark, sf_dir: str, work: str) -> dict:
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.stateful import (
        ks_drift_stream,
        ks_reference_from_df,
    )

    events_dir = os.path.join(sf_dir, "events.parquet")
    ev = spark.read.parquet(events_dir)
    schema = ev.schema
    ref = ks_reference_from_df(
        ev.limit(20000).select("event_type", F.round("value", 2).alias("value")),
        type_col="event_type",
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 2)
        .load(events_dir)
        .select("event_type", F.round("value", 2).alias("value"))
    )
    q = (
        ks_drift_stream(stream, ref)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(work, "ks_ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(1800)
    batches = _progress_state(q)
    n_types = ev.select("event_type").distinct().count()
    n_events = sum(b["input_rows"] for b in batches)
    # memory saturates once the distinct quantized support is seen:
    # the last batch must not grow state bytes by more than 2% while
    # still ingesting a full batch of events
    tail_growth = (
        (batches[-1]["state_bytes"] - batches[-2]["state_bytes"])
        / max(1, batches[-2]["state_bytes"])
        if len(batches) >= 2
        else 1.0
    )
    return {
        "pipeline": "ks_drift_stream",
        "bound": (
            "state rows == #event types; bytes saturate at the distinct "
            "quantized support, flat while events keep arriving"
        ),
        "n_events": n_events,
        "n_keys": n_types,
        "final_state_rows": batches[-1]["state_rows"],
        "tail_bytes_growth": round(tail_growth, 4),
        "batches": batches,
        "bounded": batches[-1]["state_rows"] == n_types
        and abs(tail_growth) < 0.02,
    }


def probe_hll_store(spark, sf_dir: str, work: str) -> dict:
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        hll_register_store_sink,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.sources import (
        file_stream,
    )

    events_dir = os.path.join(sf_dir, "events.parquet")
    parts = sorted(glob.glob(os.path.join(events_dir, "part-*.parquet")))
    schema = spark.read.parquet(events_dir).schema
    landing = os.path.join(work, "hll_landing")
    store = os.path.join(work, "hll_store")
    ckpt = os.path.join(work, "hll_ckpt")
    os.makedirs(landing)
    p = 6
    waves, per_wave = 4, max(1, len(parts) // 4)
    ledger, cum = [], 0
    for w in range(waves):
        chunk = parts[w * per_wave : (w + 1) * per_wave] or parts[-1:]
        for i, f in enumerate(chunk):
            shutil.copy(f, os.path.join(landing, f"w{w}_{i:03d}.parquet"))
        cum += sum(
            spark.read.parquet(f).count() for f in chunk
        )
        q = hll_register_store_sink(
            file_stream(spark, landing, schema, fmt="parquet"),
            store, ckpt, keys=["event_type"], value_col="user_id", p=p,
            available_now=True,
        )
        assert q.awaitTermination(1200)
        rows, size = _dir_stats(spark, store)
        ledger.append(
            {"wave": w, "events_cum": cum, "store_rows": rows, "store_bytes": size}
        )
    n_types = spark.read.parquet(events_dir).select("event_type").distinct().count()
    return {
        "pipeline": "hll_register_store_sink",
        "bound": f"store rows == keys * 2^{p} (one row per (key, register))",
        "n_events": cum,
        "n_keys": n_types,
        "batches": ledger,
        "bounded": all(l["store_rows"] <= n_types * (2 ** p) for l in ledger)
        and ledger[-1]["store_rows"] == ledger[0]["store_rows"],
    }


def probe_retractable_gold(spark, sf_dir: str, work: str) -> dict:
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        read_retractable_gold,
        retractable_gold_sink,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.sources import (
        file_stream,
    )

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cdc = orders.select(
        F.lit("c").alias("op"),
        F.lit(None).cast("string").alias("before_month"),
        F.lit(None).cast("double").alias("before_price"),
        F.date_format("o_orderdate", "yyyy-MM").alias("after_month"),
        F.col("o_totalprice").cast("double").alias("after_price"),
        F.col("o_orderkey"),
    )
    landing = os.path.join(work, "cdc_landing")
    # 6 insert waves over the full x10 orders table, then a change wave
    # (every 100th order deleted) — epochs after the inserts touch far
    # fewer groups, and state stays group-grain throughout
    cdc.withColumn("__w", F.pmod("o_orderkey", F.lit(6))).write.partitionBy(
        "__w"
    ).mode("overwrite").json(landing + "_all")
    os.makedirs(landing)
    for w in range(6):
        src = os.path.join(landing + "_all", f"__w={w}")
        for i, f in enumerate(sorted(glob.glob(os.path.join(src, "part-*")))):
            shutil.copy(f, os.path.join(landing, f"ins{w}_{i:03d}.json"))
    deletes = cdc.filter(F.col("o_orderkey") % 100 == 0).select(
        F.lit("d").alias("op"),
        F.col("after_month").alias("before_month"),
        F.col("after_price").alias("before_price"),
        F.lit(None).cast("string").alias("after_month"),
        F.lit(None).cast("double").alias("after_price"),
    )
    deletes.coalesce(1).write.mode("overwrite").json(landing + "_del")
    for i, f in enumerate(sorted(glob.glob(os.path.join(landing + "_del", "part-*")))):
        shutil.copy(f, os.path.join(landing, f"zdel_{i:03d}.json"))

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("op", StringType()),
            StructField("before_month", StringType()),
            StructField("before_price", DoubleType()),
            StructField("after_month", StringType()),
            StructField("after_price", DoubleType()),
            StructField("o_orderkey", LongType()),
        ]
    )
    state = os.path.join(work, "gold_state")
    q = retractable_gold_sink(
        file_stream(spark, landing, schema, max_files_per_trigger=4),
        state, os.path.join(work, "gold_ckpt"),
        cols=["month", "price"], keys=["month"],
        measures=[("revenue", "price")], available_now=True,
    )
    assert q.awaitTermination(1800)
    n_events = cdc.count() + deletes.count()
    n_groups = cdc.select("after_month").distinct().count()
    epochs = sorted(glob.glob(os.path.join(state, "epoch=*")))
    per_epoch = [
        {"epoch": os.path.basename(e), "state_rows": spark.read.parquet(e).count()}
        for e in epochs
    ]
    view = read_retractable_gold(
        spark, state, ["month"], [("revenue", "price")]
    )
    live = view.count()
    return {
        "pipeline": "retractable_gold_sink",
        "bound": "each epoch's partials <= touched groups; view = live groups",
        "n_events": n_events,
        "n_keys": n_groups,
        "epochs": per_epoch,
        "view_rows": live,
        "bounded": all(e["state_rows"] <= n_groups for e in per_epoch)
        and live <= n_groups,
    }


def probe_ann_ingest(spark, sf_dir: str, work: str) -> dict:
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.similarity import (
        ann_store_paths,
        ann_store_versions,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        ann_ingest_sink_versioned,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.sources import (
        file_stream,
    )

    emb_dir = os.path.join(sf_dir, "embeddings.parquet")
    parts = sorted(glob.glob(os.path.join(emb_dir, "part-*.parquet")))
    schema = spark.read.parquet(emb_dir).schema
    landing = os.path.join(work, "ann_landing")
    store = os.path.join(work, "ann_store")
    ckpt = os.path.join(work, "ann_ckpt")
    os.makedirs(landing)
    waves, per_wave = 4, max(1, len(parts) // 4)
    ledger, cum = [], 0
    for w in range(waves):
        chunk = parts[w * per_wave : (w + 1) * per_wave] or parts[-1:]
        for i, f in enumerate(chunk):
            shutil.copy(f, os.path.join(landing, f"w{w}_{i:03d}.parquet"))
        cum += sum(spark.read.parquet(f).count() for f in chunk)
        q = ann_ingest_sink_versioned(
            file_stream(spark, landing, schema, fmt="parquet"),
            store, ckpt, n_centroids=16, n_probe=3, available_now=True,
        )
        assert q.awaitTermination(1200)
        v = ann_store_versions(store)[-1]
        index_path, state_path = ann_store_paths(store, v)
        rows, _ = _dir_stats(spark, index_path)
        ledger.append(
            {
                "wave": w,
                "vectors_cum": cum,
                "index_rows": rows,
                "quantizer_state_bytes": os.path.getsize(state_path),
            }
        )
    sb = [l["quantizer_state_bytes"] for l in ledger]
    return {
        "pipeline": "ann_ingest_sink_versioned",
        "bound": (
            "quantizer state bytes O(n_centroids*dim), constant across "
            "waves; index rows == admitted vectors (data, not state)"
        ),
        "n_events": cum,
        "batches": ledger,
        "bounded": max(sb) - min(sb) <= 64
        and ledger[-1]["index_rows"] == cum,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(HERE, "testdata_x10/sf1.0"))
    ap.add_argument("--out", default=os.path.join(HERE, "STREAM_STATE_x10.json"))
    args = ap.parse_args()

    from dea05_e2e_kafka_streaming_pipeline_spark.session import get_spark

    spark = get_spark(app_name="stream_state_probe")
    work = tempfile.mkdtemp(prefix="stream_state_")
    sections = []
    try:
        for probe in (
            probe_dedup_stream,
            probe_ks_drift,
            probe_hll_store,
            probe_retractable_gold,
            probe_ann_ingest,
        ):
            s = probe(spark, args.sf_dir, work)
            print(
                f"# {s['pipeline']}: events={s.get('n_events')} "
                f"keys={s.get('n_keys', '-')} bounded={s['bounded']}"
            )
            sections.append(s)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    result = {
        "tier": "x10 (testdata_x10/sf1.0)",
        "all_bounded": all(s["bounded"] for s in sections),
        "pipelines": sections,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"# -> {args.out}  all_bounded={result['all_bounded']}")
    return 0 if result["all_bounded"] else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())
