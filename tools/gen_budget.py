#!/usr/bin/env python
"""Regenerate a per-tier budget file from the latest quiet-window
bench_metrics.json: per-query ceiling = 2x the recorded best-of-2,
floored at 0.5 s so sub-100ms queries don't trip on scheduler jitter.
Run after bench.py whenever the registry gains queries, so every bench
query stays budgeted.

Two tiers, one file each (bench.py picks whichever file's source sf
matches the run's sf — ceilings are sf-specific wall-clock numbers,
meaningless against a different scale):

    python bench.py                      # sf0.1 default
    python tools/gen_budget.py           # -> BENCH_BUDGET.json

    SPARK_GRAFT_SF_DIR=testdata_x10/sf1.0 \\
        SPARK_GRAFT_BENCH_METRICS=bench_metrics_x10.json python bench.py
    python tools/gen_budget.py --sf 1.0 --out BENCH_BUDGET_x10.json \\
        --metrics bench_metrics_x10.json

(the x10 bench MUST write its own side file — without
SPARK_GRAFT_BENCH_METRICS it clobbers the sf0.1 bench_metrics.json
snapshot that the sf0.1 budget's provenance depends on)
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--out", default="BENCH_BUDGET.json")
    ap.add_argument(
        "--metrics", default="bench_metrics.json",
        help="bench_metrics snapshot to derive ceilings from",
    )
    args = ap.parse_args()

    with open(os.path.join(HERE, args.metrics)) as f:
        m = json.load(f)
    if m.get("sf") != args.sf:
        raise SystemExit(f"{args.metrics} is sf={m.get('sf')}, need {args.sf}")
    budget = {
        "comment": (
            f"Per-query wall-clock ceilings at sf{args.sf}, local[32]: 2x "
            "the latest quiet-window best-of-2 plus a 0.25s additive "
            "jitter margin "
            f"({args.metrics}, total {m['total_sec']}s), floored at 0.5s. "
            "The additive term is scheduler-jitter absorption for "
            "sub-second queries (their variance is additive ~0.2-0.3s, "
            "not multiplicative, so a pure 2x ceiling trips on noise); "
            "for multi-second queries it is negligible. bench.py exits "
            "nonzero only when >25% of budgeted queries exceed their "
            "ceiling - a global host-noise window inflates everything a "
            "little, a plan regression inflates a few queries 2x+."
        ),
        "source_run": {
            "sf": args.sf,
            "total_sec": m["total_sec"],
            "date": dt.date.today().isoformat(),
        },
        "ceilings_sec": {
            q: round(max(0.5, 2.0 * t + 0.25), 3)
            for q, t in m["queries"].items()
        },
    }
    out = os.path.join(HERE, args.out)
    with open(out, "w") as f:
        json.dump(budget, f, indent=1)
    print(f"wrote {out}: {len(budget['ceilings_sec'])} ceilings")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
