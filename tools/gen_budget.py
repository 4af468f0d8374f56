#!/usr/bin/env python
"""Regenerate BENCH_BUDGET.json from the latest quiet-window
bench_metrics.json (must be an sf0.1 run): per-query ceiling = 2x the
recorded best-of-2, floored at 0.5 s so sub-100ms queries don't trip on
scheduler jitter. Run after bench.py at sf0.1 whenever the registry
gains queries, so every bench query stays budgeted.

    python bench.py            # sf0.1 default
    python tools/gen_budget.py
"""

from __future__ import annotations

import datetime as dt
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(os.path.join(HERE, "bench_metrics.json")) as f:
        m = json.load(f)
    if m.get("sf") != 0.1:
        raise SystemExit(f"bench_metrics.json is sf={m.get('sf')}, need 0.1")
    budget = {
        "comment": (
            "Per-query wall-clock ceilings at sf0.1, local[32]: 2x the "
            "latest quiet-window best-of-2 (bench_metrics.json, total "
            f"{m['total_sec']}s), floored at 0.5s so sub-100ms queries "
            "don't trip on scheduler jitter. bench.py exits nonzero only "
            "when >25% of budgeted queries exceed their ceiling - a "
            "global host-noise window inflates everything a little, a "
            "plan regression inflates a few queries 2x+."
        ),
        "source_run": {
            "sf": 0.1,
            "total_sec": m["total_sec"],
            "date": dt.date.today().isoformat(),
        },
        "ceilings_sec": {
            q: round(max(0.5, 2.0 * t), 3) for q, t in m["queries"].items()
        },
    }
    out = os.path.join(HERE, "BENCH_BUDGET.json")
    with open(out, "w") as f:
        json.dump(budget, f, indent=1)
    print(f"wrote {out}: {len(budget['ceilings_sec'])} ceilings")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
