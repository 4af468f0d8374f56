#!/usr/bin/env python
"""Oracle correctness sweep AT THE x10 TIER — the same engine-vs-DuckDB
rows/schema/value-hash contract the driver applies at sf0.01
(selfcheck.run_sweep), run against the persisted 10x dataset instead.

Why this exists: the sf0.01 sweep proves semantics, the x10 BENCH
proves cost — this closes the remaining gap by proving the ANSWERS are
still right at 10x (different partition counts, AQE decisions, overflow
surfaces, skew paths). Round 5 it caught three real tier-sensitivity
issues on first run: a DECIMAL(18) product overflow in the
autocorrelation ORACLE (fixed — widened to DECIMAL(38,2)), and the two
path-bound oracles listed below.

Exclusions, each by documented necessity, not convenience:
- PATH_BOUND: oracles that must name a parquet file directly because
  DuckDB table functions (parquet_metadata, read_parquet filename=true)
  cannot run over the registered views; the driver contract fixes them
  to the sf0.01 path, so at any other tier they mismatch by
  construction. Their SPARK sides derive from sf_dir and run fine.
- QUADRATIC_ORACLE: nation/label-blocked pair queries whose DUCKDB
  replay is a 200-450M-pair CASE/cosine evaluation at x10 (hours);
  they are the quadratic-growth exhibits of SCALE.md, hash-matched at
  sf0.01, with measured linear twins (SNB / adaptive cells) that DO
  sweep here.
- ENGINE_N2_AUDIT: recall-audit queries whose engine side deliberately
  computes unblocked O(n²) exact pairs as the comparison baseline
  (bench=False apparatus).
- theil_sen_revenue_trend: the ORACLE's final BIGINT cast (the
  duckdb->pandas exactness compromise documented at its definition)
  overflows at x10; the engine output is decimal(38,0) and fine.

Usage: python tools/x10_sweep.py [sf_dir] [detail_out]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH_BOUND = {"parquet_rowgroup_stats", "doc_provenance"}
QUADRATIC_ORACLE = {
    "entity_resolution_customers",
    "linkage_customer_pairs",
    "embedding_near_dup_pairs",
    "dbscan_embeddings",
    "semantic_dedup_label",
    "knn_blocked_exact",
    "edit_distance_pairs",
}
ENGINE_N2_AUDIT = {
    "near_dup_cells_recall_violations",
    "near_dup_multiprobe_recall_violations",
}
ORACLE_OVERFLOW = {"theil_sen_revenue_trend"}

EXCLUDE = PATH_BOUND | QUADRATIC_ORACLE | ENGINE_N2_AUDIT | ORACLE_OVERFLOW


def main() -> int:
    import importlib

    from selfcheck import run_sweep
    from dea05_e2e_kafka_streaming_pipeline_spark.session import get_spark

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "testdata_x10", "sf1.0"
    )
    detail_out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        here, "CORRECTNESS_x10_r05.json"
    )
    mod = importlib.import_module("__spark_entry__")
    names = set(mod.queries()) - EXCLUDE
    spark = get_spark(app_name="x10_sweep")
    res = run_sweep(spark, sf_dir, only=names, quiet=True, detail_out=detail_out)
    print(
        f"x10 sweep: {res['oracle_checked']} oracle hash-matches, "
        f"{res['rows_only']} rows-only, {len(res['failures'])} failures "
        f"({len(EXCLUDE)} excluded by documented necessity) -> {detail_out}"
    )
    if res["failures"]:
        print("FAILURES:", res["failures"])
    return 1 if res["failures"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
