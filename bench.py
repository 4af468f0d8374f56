#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute); results are forced with
a cheap count-collecting action so timing includes the full physical plan
but not driver-side materialization of large results.
"""

from __future__ import annotations

import json
import os
import sys
import time

from dea05_e2e_kafka_streaming_pipeline_spark import queries as registry
from dea05_e2e_kafka_streaming_pipeline_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    qs = registry.queries()
    timings: dict[str, float] = {}
    # warm the JVM + file listing once (excluded from per-query timings)
    next(iter(qs.values()))(spark, sf_dir).count()

    for name, fn in qs.items():
        # best-of-2: single-shot local timings fluctuate ±40% with JIT/GC
        # noise; the minimum is the stable signal for plan regressions
        best, n = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "engine_query_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
