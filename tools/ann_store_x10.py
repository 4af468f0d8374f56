#!/usr/bin/env python
"""Versioned ANN store at the x10 tier (round-7 verdict item 6).

The rebuild-and-swap contract is pytest-proven at 200-400 vectors; this
tool replays the PERSISTED x10 embeddings table (20k × 64-dim) through
the real streaming surface and writes ``ANN_STORE_x10.json``:

1. **Ingest in waves** — four 5k-vector waves land as files and flow
   through ``ann_ingest_sink_versioned`` (availableNow per wave, one
   checkpoint), bootstrapping v0 from wave 1. Wave 4 is deterministically
   DRIFTED (+0.6 on the first 8 dims) so the occupancy-PSI drift signal
   actually fires; the ledger records per-wave wall, store rows, store
   bytes, quantizer-state bytes (must stay O(centroids·dim) — constant),
   and PSI.
2. **Rebuild-and-swap while readers hold v0** — ``ann_index_rebuild``
   retrains on v0's 20k accumulated vectors and publishes v1; the ledger
   records rebuild wall, v1 rows (== v0 rows), and that a reader pinned
   on v0 sees a byte-identical row-set before and after the swap AND
   after the post-swap wave.
3. **Post-swap ingest** — one more wave lands; the ledger asserts it
   reached v1 only.
4. **Recall audit on the REBUILT version** — two rows, mirroring the
   two contracts of SCALE.md §isotropic:
   - PLANTED (asserted): query pinned-v1 with the deterministic twin
     (cosine ≈ 0.989, ``planted_twin_vectors`` arithmetic) of each of
     the first 50 base vectors at the TRAINED n_probe; the true base id
     must land in the ANN top-10. This is the tier-invariant contract a
     dedup pipeline needs (measured 0.9994 at x10 in the sweep audit).
   - BACKGROUND (recorded, no floor): mean/min top-10 recall vs exact
     brute-force cosine for 20 base-vector queries at the trained
     n_probe. On this isotropic fixture a fixed background floor is an
     output-size impossibility (§isotropic) — the number is recorded so
     drift across rounds is visible, not asserted.

Every ``ok_*`` flag in the artifact is asserted here — a False flag
exits nonzero, so the committed ledger can't narrate.

Usage:  python tools/ann_store_x10.py [--sf-dir testdata_x10/sf1.0]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_CENTROIDS = 32
N_PROBE = 5  # adaptive_probes(32) = ceil(1.3 * 32^(1/3))
N_QUERIES = 20
N_PLANTED = 50
RECALL_FLOOR = 0.80
K = 10


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _rowset_digest(df) -> str:
    rows = sorted(
        (r.vec_id, r.ivf_cell, tuple(r.ivf_probes)) for r in df.collect()
    )
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(HERE, "testdata_x10", "sf1.0"))
    ap.add_argument("--out", default=os.path.join(HERE, "ANN_STORE_x10.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.similarity import (
        ann_index_rebuild,
        ann_store_paths,
        ann_store_read,
        ann_store_state,
        ann_store_topk,
        ann_store_versions,
        cosine_topk,
        planted_twin_vectors,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.session import get_spark
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        ann_ingest_sink_versioned,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.sources import (
        file_stream,
    )

    spark = get_spark(app_name="ann_store_x10")
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    n_total = emb.count()
    wave_size = n_total // 4

    work = tempfile.mkdtemp(prefix="ann_x10_")
    landing = os.path.join(work, "landing")
    store = os.path.join(work, "store")
    ckpt = os.path.join(work, "ckpt")
    vec_schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])

    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    def land(name: str, df) -> None:
        df.coalesce(4).write.mode("error").json(os.path.join(landing, name))

    def run_wave() -> float:
        stream = file_stream(
            spark, os.path.join(landing, "*"), vec_schema,
            max_files_per_trigger=64,
        )
        t = time.time()
        q = ann_ingest_sink_versioned(
            stream, store, ckpt,
            n_centroids=N_CENTROIDS, n_probe=N_PROBE, available_now=True,
        )
        assert q.awaitTermination(1800)
        return round(time.time() - t, 3)

    ledger: dict = {
        "tier": f"x10 ({args.sf_dir}, {n_total} vectors x 64 dim)",
        "quantizer": {"n_centroids": N_CENTROIDS, "n_probe": N_PROBE},
        "waves": [],
    }

    # wave 4 is drifted so the PSI trigger actually fires at this tier
    drift = F.transform(
        "embedding",
        lambda x, i: F.when(i < 8, x + F.lit(0.6)).otherwise(x),
    )
    for w in range(4):
        lo, hi = w * wave_size, (w + 1) * wave_size
        wdf = base.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        if w == 3:
            wdf = wdf.select("vec_id", drift.alias("embedding"))
        land(f"w{w}", wdf)
        wall = run_wave()
        version = ann_store_versions(store)[-1]
        index_path, state_path = ann_store_paths(store, version)
        state = ann_store_state(store, version)
        ledger["waves"].append({
            "wave": w,
            "rows_landed": wave_size,
            "ingest_wall_sec": wall,
            "version": version,
            "store_rows": ann_store_read(spark, store, version).count(),
            "index_bytes": _dir_bytes(index_path),
            "state_bytes": os.path.getsize(state_path),
            "psi": state.get("psi"),
            "retrain_due": state.get("retrain_due"),
            "drifted": w == 3,
        })

    last = ledger["waves"][-1]
    ledger["ok_state_constant"] = (
        max(w["state_bytes"] for w in ledger["waves"])
        <= 2 * min(w["state_bytes"] for w in ledger["waves"])
    )
    ledger["ok_drift_fired"] = bool(last["retrain_due"])

    # pin v0's row-set, then rebuild-and-swap
    v0_digest_before = _rowset_digest(ann_store_read(spark, store, 0))
    t = time.time()
    s1 = ann_index_rebuild(
        spark, store, n_centroids=N_CENTROIDS, n_probe=N_PROBE,
        sample_rows=4096,
    )
    rebuild_wall = round(time.time() - t, 3)
    v1_rows = ann_store_read(spark, store, 1).count()
    ledger["rebuild"] = {
        "wall_sec": rebuild_wall,
        "from_version": 0,
        "to_version": s1["version"],
        "rows": v1_rows,
        "index_bytes": _dir_bytes(ann_store_paths(store, 1)[0]),
        "retrain_due_after": bool(ann_store_state(store, 1).get("retrain_due")),
    }
    ledger["ok_rebuild_complete"] = v1_rows == last["store_rows"]
    ledger["ok_baseline_reset"] = not ledger["rebuild"]["retrain_due_after"]

    # post-swap wave: fresh ids (copies of the first 1000 vectors)
    extra = base.filter(F.col("vec_id") < 1000).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    land("w_post", extra)
    post_wall = run_wave()
    v0_rows_after = ann_store_read(spark, store, 0).count()
    v1_rows_after = ann_store_read(spark, store, 1).count()
    ledger["post_swap_wave"] = {
        "rows_landed": 1000,
        "ingest_wall_sec": post_wall,
        "v0_rows_after": v0_rows_after,
        "v1_rows_after": v1_rows_after,
        "reconciled_from": ann_store_state(store, 1).get("reconciled_from"),
    }
    ledger["ok_post_swap_in_v1_only"] = (
        v0_rows_after == last["store_rows"]
        and v1_rows_after == last["store_rows"] + 1000
    )
    v0_digest_after = _rowset_digest(ann_store_read(spark, store, 0))
    ledger["ok_pinned_v0_stable"] = v0_digest_before == v0_digest_after

    # recall audit on the rebuilt version — the two §isotropic contracts
    v1 = ann_store_read(spark, store, 1).select("vec_id", "embedding").cache()
    v1.count()

    # (a) PLANTED, asserted: twin queries must recover their base id
    twins = {
        r.vec_id: list(r.embedding)
        for r in planted_twin_vectors(
            base.filter(F.col("vec_id") < N_PLANTED)
        ).collect()
    }
    hits = 0
    for twin_id, qv in sorted(twins.items()):
        base_id = twin_id - 1_000_000_000
        found = {
            r.vec_id
            for r in ann_store_topk(spark, store, qv, k=K, version=1).collect()
        }
        hits += int(base_id in found)
    planted_recall = hits / len(twins)
    ledger["recall_audit_v1_planted"] = {
        "n_queries": len(twins),
        "k": K,
        "nprobe": N_PROBE,
        "twin_cosine": "~0.989 (planted_twin_vectors, noise 0.15)",
        "recall": round(planted_recall, 4),
        "floor": RECALL_FLOOR,
    }
    ledger["ok_planted_recall_floor"] = planted_recall >= RECALL_FLOOR

    # (b) BACKGROUND, recorded: no floor is honest on an isotropic
    # fixture (SCALE.md §isotropic — the >=tau neighbor set is Theta(n²))
    recalls = []
    for r in base.filter(F.col("vec_id") < N_QUERIES).collect():
        qv = list(r.embedding)
        exact = {x.vec_id for x in cosine_topk(v1, qv, K).collect()}
        approx = {
            x.vec_id
            for x in ann_store_topk(spark, store, qv, k=K, version=1).collect()
        }
        recalls.append(
            {"query_vec_id": r.vec_id, "recall_at_10": len(exact & approx) / K}
        )
    v1.unpersist()
    mean_r = sum(x["recall_at_10"] for x in recalls) / len(recalls)
    ledger["recall_audit_v1_background"] = {
        "n_queries": len(recalls),
        "k": K,
        "nprobe": N_PROBE,
        "mean_recall": round(mean_r, 4),
        "min_recall": round(min(x["recall_at_10"] for x in recalls), 4),
        "note": (
            "recorded for cross-round drift visibility; no floor — "
            "isotropic background top-k recall cannot hold one at a "
            "linear-cost probe setting (SCALE.md §isotropic)"
        ),
        "per_query": recalls,
    }

    with open(args.out, "w") as f:
        json.dump(ledger, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)

    bad = [k for k, v in ledger.items() if k.startswith("ok_") and not v]
    print(
        f"ANN store x10: {n_total} vectors, rebuild {rebuild_wall}s, "
        f"planted recall {planted_recall:.3f}, background mean {mean_r:.3f} -> {args.out}"
    )
    if bad:
        print(f"FAILED flags: {bad}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
