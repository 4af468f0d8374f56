#!/usr/bin/env python
"""Diff plan fingerprints between two bench_metrics.json snapshots.

bench.py records a normalized-physical-plan md5 per query
(`plan_fingerprints`). Timing noise can mask a plan regression (a lost
broadcast, a new exchange); fingerprints can't. Usage:

    python tools/plan_diff.py old_bench_metrics.json [new_bench_metrics.json]

(new defaults to the repo's current bench_metrics.json). Prints one
line per added / removed / changed query and exits 1 if any CHANGED
fingerprints exist — wire it after bench.py in any regression loop, and
`explain("formatted")` whatever it names.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    old_path = sys.argv[1]
    new_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_metrics.json",
        )
    )
    with open(old_path) as f:
        old = json.load(f).get("plan_fingerprints", {})
    with open(new_path) as f:
        newm = json.load(f)
    new = newm.get("plan_fingerprints", {})
    times = newm.get("queries", {})

    changed = sorted(q for q in old.keys() & new.keys() if old[q] != new[q])
    added = sorted(new.keys() - old.keys())
    removed = sorted(old.keys() - new.keys())
    for q in changed:
        print(f"CHANGED {q}  ({times.get(q, '?')}s)  {old[q][:8]} -> {new[q][:8]}")
    for q in added:
        print(f"ADDED   {q}")
    for q in removed:
        print(f"REMOVED {q}")
    if not (changed or added or removed):
        print(f"identical plans: {len(new)} queries")
    return 1 if changed else 0


if __name__ == "__main__":
    raise SystemExit(main())
