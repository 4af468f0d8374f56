#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE compact JSON line to stdout:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "sf": ..., "n_queries": N, ...}

The stdout line is deliberately tiny (<200 bytes). Per-query timings AND
per-query stage metrics (shuffle bytes, input records, rows/s, spill)
all go to `bench_metrics.json` next to this script: the driver's
output-tail capture parses the single stdout JSON line, and inlining
per-query dicts overflowed it in BOTH round 2 (9 KB metrics) and round 3
(4-5 KB timings) — `parsed: null` twice. Nothing per-query is inlined
anymore.

Regression gate: if `BENCH_BUDGET.json` exists beside this script, each
query's best-of-2 time is compared against its recorded ceiling; queries
over budget are listed on stderr and in the stdout line's
`over_budget` count. Host-noise windows swing absolute totals 20-35%
(BASELINE.md), so the gate trips only when >25% of budgeted queries
exceed their ceiling — a global slow window inflates everything at once,
a real regression inflates a few queries 2x+.

Each query is timed end-to-end (plan + execute); results are forced with
a cheap count-collecting action so timing includes the full physical plan
but not driver-side materialization of large results. Per-query shuffle
bytes / input records come from the Spark status REST API (stage-metric
deltas around the second timed run) — BASELINE.md commits to recording
rows/s and shuffle volume alongside wall-clock.

Times registry.bench_queries(): the driver's correctness sweep runs
every registered query, but bench=False correctness apparatus
(cross-check queries that re-run other pipelines; md5 oracle mirrors of
production hash paths) is excluded here so suite totals compare
like-for-like across rounds (BASELINE.md documents the split).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from dea05_e2e_kafka_streaming_pipeline_spark import queries as registry
from dea05_e2e_kafka_streaming_pipeline_spark.session import get_spark

_UI_PORT = int(os.environ.get("SPARK_GRAFT_BENCH_UI_PORT", "4047"))


def _stage_totals(app_id: str) -> dict[str, int] | None:
    """Cumulative completed-stage metrics from the local status API."""
    url = (
        f"http://localhost:{_UI_PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            stages = json.load(resp)
    except Exception:
        return None
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "input_records": sum(s.get("inputRecords", 0) for s in stages),
        "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
        "disk_spill_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
    }


def _plan_fingerprint(df) -> str:
    """md5 of the normalized physical plan — expression ids, object
    addresses, temp paths, and codegen stage ids stripped so the hash
    is stable across sessions. BENCH_BUDGET catches time regressions;
    fingerprints catch PLAN regressions (a lost broadcast, a new
    exchange) even inside timing noise: diff `plan_fingerprints`
    between two bench_metrics.json snapshots and explain() whatever
    moved."""
    import hashlib
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = re.sub(r"#\d+[L]?", "#", plan)
    plan = re.sub(r"@[0-9a-f]{6,}", "@", plan)
    plan = re.sub(r"/tmp/\S+", "/tmp/_", plan)
    plan = re.sub(r"\[plan_id=\d+\]", "", plan)
    plan = re.sub(r"\(\d+\)", "()", plan)
    plan = re.sub(r"ivf_cell=\d+", "ivf_cell=_", plan)
    return hashlib.md5(plan.encode()).hexdigest()


def _quiet_known_warnings(spark) -> None:
    """Route two known-benign warning families out of the bench tail —
    the driver's output-tail capture is the contract surface and was 90%
    noise (round-6 verdict item 7):

    - WindowExec's no-partition warning: every remaining site is a
      DECLARED-BOUNDED window (daily-grain series, vocab ranks —
      operators/timeseries.py, operators/curation.py document each);
      the growing-table sites were re-planned in rounds 5-6. The
      suppression does NOT blind the repo to new regressions: the
      plan-level guard tests/test_plans.py::
      test_no_undeclared_unpartitioned_windows fails on any
      unpartitioned Window outside the documented allowlist.
    - CacheManager's "already cached" notice: queries share cached
      scans by design; re-marking an already-cached plan is a no-op.

    Uses the log4j2 Configurator so only these two loggers move to
    ERROR; everything else keeps the session default."""
    try:
        jvm = spark.sparkContext._jvm
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        level = jvm.org.apache.logging.log4j.Level.ERROR
        for logger in (
            "org.apache.spark.sql.execution.window.WindowExec",
            "org.apache.spark.sql.execution.CacheManager",
        ):
            configurator.setLevel(logger, level)
    except Exception as e:  # noqa: BLE001 — cosmetics must never fail a run
        print(f"# log-quiet skipped: {e}", file=sys.stderr)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="bench",
        extra_confs={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(_UI_PORT),
            # keep every stage of the run visible to the metrics poll
            "spark.ui.retainedStages": "5000",
        },
    )
    app_id = spark.sparkContext.applicationId
    _quiet_known_warnings(spark)
    # Cache hygiene at memory-constrained tiers: the x100 spill run
    # holds 31 expensive queries' cached scans on an 8 GiB heap — cache
    # accumulated across the suite amplified later queries' GC (r6:
    # semantic_dedup_kmeans 13.7x in-suite vs 7.4x standalone). With
    # SPARK_GRAFT_DRIVER_MEM set (the constrained-tier signal) every
    # query starts cache-cold, so the ledger measures the PLAN, not the
    # suite's memory history. Unconstrained tiers keep warm reuse.
    clear_cache = bool(os.environ.get("SPARK_GRAFT_DRIVER_MEM")) or (
        os.environ.get("SPARK_GRAFT_BENCH_CLEARCACHE") == "1"
    )

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # exhibits (bench_tier_max): the deliberately-quadratic SQL-exactness
    # anchors are timed only up to their tier — at x10+ the suite wall
    # measures scale-path plans, not known-n² apparatus (VERDICT r5 §2)
    exhibits = (
        registry.bench_exhibits(sf_val) if isinstance(sf_val, float) else []
    )
    qs = registry.bench_queries(sf_val if isinstance(sf_val, float) else None)
    # subset mode (SPARK_GRAFT_BENCH_ONLY=q1,q2,...): time only the
    # named queries — the spill-tier harness benches the ~30 most
    # expensive scale-path plans at x100 without paying for the whole
    # suite at 100x data (round-5 verdict item 5)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        missing = names - set(qs)
        if missing:
            print(f"# BENCH_ONLY unknown: {sorted(missing)}", file=sys.stderr)
        qs = {n: f for n, f in qs.items() if n in names}
    if exhibits:
        print(
            f"# exhibits excluded at sf={sf_val}: {', '.join(exhibits)}",
            file=sys.stderr,
        )
    timings: dict[str, float] = {}
    metrics: dict[str, dict] = {}
    plans: dict[str, str] = {}
    # warm the JVM + file listing once (excluded from per-query timings)
    next(iter(qs.values()))(spark, sf_dir).count()

    for name, fn in qs.items():
        if clear_cache:
            spark.catalog.clearCache()
        # best-of-2: single-shot local timings fluctuate ±40% with JIT/GC
        # noise; the minimum is the stable signal for plan regressions
        best, n = None, 0
        before = after = None
        run2_elapsed = None
        # SPARK_GRAFT_BENCH_RUNS=1 drops the best-of-2 discipline — the
        # x100 spill tier pays minutes per query, where a second pass
        # buys noise reduction nobody needs (budgets aren't gated there)
        n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
        for i in range(n_runs):
            if i == n_runs - 1:
                before = _stage_totals(app_id)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            t = time.perf_counter() - t0
            if i == n_runs - 1:
                after = _stage_totals(app_id)
                run2_elapsed = t
            best = t if best is None else min(best, t)
        timings[name] = round(best, 4)
        plans[name] = _plan_fingerprint(df)
        if before is not None and after is not None:
            delta = {k: after[k] - before[k] for k in after}
            # rows/s from run-2 records over run-2 time: the stage-metric
            # delta brackets run 2, so the denominator must too (using
            # `best` skewed the rate whenever run 1 was the faster one)
            delta["rows_per_sec"] = (
                round(delta["input_records"] / run2_elapsed)
                if run2_elapsed and run2_elapsed > 0
                else 0
            )
            delta["output_rows"] = n
            metrics[name] = delta
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)

    # ---- per-query regression budget (BENCH_BUDGET*.json) ---------------
    # One budget file per scale tier (BENCH_BUDGET.json = sf0.1,
    # BENCH_BUDGET_x10.json = the persisted sf1.0 tier); the run picks
    # whichever file's source sf matches — ceilings are sf-specific
    # wall-clock numbers, meaningless against a different scale.
    here = os.path.dirname(os.path.abspath(__file__))
    over_budget: dict[str, dict[str, float]] = {}
    budgeted = 0
    budget: dict[str, float] = {}
    for fname in ("BENCH_BUDGET.json", "BENCH_BUDGET_x10.json"):
        budget_path = os.path.join(here, fname)
        if not os.path.exists(budget_path):
            continue
        with open(budget_path) as f:
            bj = json.load(f)
        if bj.get("source_run", {}).get("sf") == sf_val:
            budget = bj.get("ceilings_sec", {})
            break
    if budget:
        for name, ceiling in budget.items():
            if name not in timings:
                continue
            budgeted += 1
            if timings[name] > ceiling:
                over_budget[name] = {
                    "sec": timings[name],
                    "ceiling": ceiling,
                    "ratio": round(timings[name] / ceiling, 2),
                }
        for name, o in sorted(
            over_budget.items(), key=lambda kv: -kv[1]["ratio"]
        ):
            print(
                f"# OVER BUDGET {name}: {o['sec']:.3f}s > {o['ceiling']:.3f}s"
                f" ({o['ratio']}x)",
                file=sys.stderr,
            )

    # detailed per-query data goes to a side file so the stdout line stays
    # small enough for the driver's output-tail JSON capture (module doc)
    side = {
        "queries": timings,
        "query_metrics": metrics,
        "plan_fingerprints": plans,
        "shuffle_write_bytes_total": sum(
            m["shuffle_write_bytes"] for m in metrics.values()
        ),
        "over_budget": over_budget,
        "total_sec": total,
        "sf": sf_val,
        "exhibits_excluded": exhibits,
    }
    # ---- driver-sample insurance: full oracle sweep at sf0.01 -----------
    # The round driver samples ~50 of the registered queries for its
    # correctness file; this self-reported sweep covers ALL of them (the
    # same engine-vs-DuckDB hash contract, via selfcheck.run_sweep) so the
    # round artifact proves every query. ~2.5 min at sf0.01; disable with
    # SPARK_GRAFT_BENCH_SWEEP=0.
    sweep_line: dict = {}
    if os.environ.get("SPARK_GRAFT_BENCH_SWEEP", "1") != "0":
        try:
            from selfcheck import run_sweep

            # the per-query sweep detail is committed as the round's
            # full-coverage correctness artifact (driver samples ~50;
            # this file proves all of them)
            detail_out = os.path.join(
                here,
                os.environ.get(
                    "SPARK_GRAFT_SWEEP_DETAIL", "CORRECTNESS_full_r07.json"
                ),
            )
            res = run_sweep(
                spark, "/root/testdata/sf0.01", quiet=True,
                detail_out=detail_out,
            )
            side["sweep"] = res
            sweep_line = {
                "oracle_checked": res["oracle_checked"],
                "sweep_failures": len(res["failures"]),
            }
            if res["failures"]:
                print(f"# SWEEP FAILURES: {res['failures']}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — sweep is evidence, not a gate
            print(f"# sweep skipped: {e}", file=sys.stderr)

    # per-tier side files: the x10 run writes bench_metrics_x10.json so
    # the sf0.1 snapshot (budget provenance) isn't clobbered
    side["cpus"] = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    side_path = os.path.join(
        here, os.environ.get("SPARK_GRAFT_BENCH_METRICS", "bench_metrics.json")
    )
    with open(side_path, "w") as f:
        json.dump(side, f, indent=1)
    print(f"# metrics -> {side_path}", file=sys.stderr)
    # ALSO write a per-cpus copy (r8 verdict item 8): the driver's
    # low-core scaling rerun overwrites bench_metrics.json, which
    # destroyed the 32-core per-query record in round 8 (the driver's
    # per_query/scaling tables came back empty). A cpus-suffixed
    # sibling survives any later rerun, so two runs from one round can
    # always be diffed. Pure artifact addition — timings, methodology
    # and the stdout contract are untouched.
    cpus_path = side_path.replace(".json", f"_c{side['cpus']}.json")
    with open(cpus_path, "w") as f:
        json.dump(side, f, indent=1)
    print(f"# metrics -> {cpus_path}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "engine_query_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "over_budget": len(over_budget),
                **({"exhibits_excluded": len(exhibits)} if exhibits else {}),
                **sweep_line,
            }
        )
    )
    spark.stop()
    # the gate trips on breadth, not depth: a noisy host inflates every
    # query a little; a plan regression inflates a few queries a lot
    if budgeted and len(over_budget) > 0.25 * budgeted:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
