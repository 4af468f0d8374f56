#!/usr/bin/env python
"""Driver-mirror correctness sweep: run every ``__spark_entry__.queries()``
entry on Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet
tables, then compare row count, column names, and a column-name-sorted value
hash — the same contract the round driver applies at sf=0.01.

Usage:  python selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import gc
import hashlib
import math
import os
import sys

import duckdb
import pandas as pd

import __spark_entry__ as entry
from dea05_e2e_kafka_streaming_pipeline_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# The tier the round driver fixes its oracle contract to. A handful of
# oracles must name a parquet path directly (DuckDB's parquet_metadata /
# read_parquet(filename=true) cannot run over the registered views), and
# the committed SQL string names THIS tier's path. _retarget_oracle
# rewrites those literals when the sweep runs at another tier, so the
# path-bound queries stay checkable at x10 instead of being excluded
# (round-5 verdict item 4).
DRIVER_SF = "/root/testdata/sf0.01"


def _retarget_oracle(sql: str, sf_dir: str) -> str:
    """Rewrite driver-tier parquet-path literals in an oracle to the
    sweep tier's path (globbed when the tier's table is a parquet
    DIRECTORY, as engine-written tiers are). At the driver tier this is
    an exact no-op — the committed contract string runs verbatim."""
    sf_dir = os.path.abspath(sf_dir)
    if sf_dir == DRIVER_SF or DRIVER_SF not in sql:
        return sql
    for t in TABLES:
        src = f"{DRIVER_SF}/{t}.parquet"
        if src in sql:
            dst = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(dst):
                dst = f"{dst}/*.parquet"
            sql = sql.replace(src, dst)
    return sql


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
        # Spark hands back datetime.datetime, DuckDB pd.Timestamp —
        # normalize both to one textual form
        return pd.Timestamp(v).isoformat()
    return str(v)


def _value_hash(df: pd.DataFrame) -> str:
    """Row-order-insensitive value digest: per-row md5 digests, sorted,
    md5'd together. Equality semantics are identical to hashing the
    sorted row strings (two frames match iff their row MULTISETS match
    cell-for-cell), but peak memory is 16 bytes per row instead of the
    full stringified table — the x100 sweep's 500k-row array-heavy
    results MemoryError'd the old single-join form on an 8 GiB driver."""
    df = df[sorted(df.columns)]
    digests = sorted(
        hashlib.md5(
            ",".join(_norm_cell(v) for v in rec).encode()
        ).digest()
        for rec in df.itertuples(index=False)
    )
    h = hashlib.md5()
    for d in digests:
        h.update(d)
    return h.hexdigest()


def run_sweep(
    spark,
    sf_dir: str,
    only: set[str] | None = None,
    quiet: bool = False,
    detail_out: str | None = None,
) -> dict:
    """Run the driver-mirror sweep with an EXISTING SparkSession.

    Returns ``{"oracle_checked": N, "rows_only": M, "failures": [...]}``
    — the compact summary bench.py inlines in its stdout line so every
    round's artifacts prove ALL queries, not just the driver's sample.

    ``detail_out``: also write per-query records (rows/schema/hash
    match, row counts — the driver's CORRECTNESS file format) to this
    JSON path, the committed full-coverage artifact (r4 verdict item
    7: the round ledger should not depend on the driver's ~50-query
    sample for full-registry evidence).
    """
    def _fresh_con():
        c = duckdb.connect()
        # bound the oracle side: a single heavy oracle must spill to
        # disk, not grow the buffer pool until the PROCESS can't malloc
        # (the x100 sweep died that way mid-run — bad_alloc in a fresh
        # connect after ~90 multi-million-row compares)
        c.execute("SET memory_limit='24GB'")
        c.execute("SET temp_directory='/tmp/duckdb_sweep_spill'")
        for t in TABLES:
            # driver tiers are single files; engine-written tiers (the
            # x10 scale dir) are parquet DIRECTORIES — glob for duckdb
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        return c

    con = _fresh_con()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    audits = getattr(entry, "audited_by", dict)() or {}
    bad: list[str] = []
    checked = rows_only = 0
    detail: dict[str, dict] = {}

    def say(msg: str) -> None:
        if not quiet:
            print(msg)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            say(f"ERR  {name}: spark: {e}")
            bad.append(name)
            detail[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark: {e}",
            }
            continue
        sql = oracles.get(name)
        if sql is None:
            # by-design rows-only (engine-trained state SQL can't
            # replay): err stays null and the record NAMES the green
            # companions that pin it — adjudicated after the loop, so
            # the contract file reads as what it is (round-5 verdict:
            # `err: "no_oracle"` looked like 11 failures)
            comp = list(audits.get(name, ()))
            say(f"ROWS {name}: {len(got)} rows (audited by {comp or 'nothing'})")
            rows_only += 1
            detail[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(got),
                "oracle_rows": None, "err": None,
                "audited_by": comp,
            }
            continue
        try:
            want = con.execute(_retarget_oracle(sql, sf_dir)).df()
        except Exception as e:  # noqa: BLE001
            # blast-radius isolation: a failed oracle (an OOM most of
            # all) can leave the shared connection's allocator pinned,
            # cascading bad_allocs into every LATER oracle (x100 sweep,
            # round 7: one OOM poisoned 47 downstream queries).
            # Reconnect and retry ONCE on a fresh connection before
            # recording the error.
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass
            con = _fresh_con()
            try:
                want = con.execute(_retarget_oracle(sql, sf_dir)).df()
            except Exception as e2:  # noqa: BLE001
                say(f"ERR  {name}: duckdb: {e2}")
                bad.append(name)
                detail[name] = {
                    "rows_match": False, "schema_match": False,
                    "hash_match": False, "spark_rows": len(got),
                    "oracle_rows": None, "err": f"duckdb: {e2}",
                }
                try:
                    con.close()
                except Exception:  # noqa: BLE001
                    pass
                con = _fresh_con()
                continue
        cols_ok = sorted(got.columns) == sorted(want.columns)
        rows_ok = len(got) == len(want)
        hash_ok = cols_ok and rows_ok and _value_hash(got) == _value_hash(want)
        detail[name] = {
            "rows_match": rows_ok, "schema_match": cols_ok,
            "hash_match": hash_ok, "spark_rows": len(got),
            "oracle_rows": len(want), "err": None,
        }
        if cols_ok and rows_ok and hash_ok:
            checked += 1
            say(f"OK   {name}: {len(got)} rows")
        else:
            bad.append(name)
            say(
                f"FAIL {name}: cols={cols_ok}"
                f" rows={rows_ok}({len(got)}/{len(want)}) hash={hash_ok}"
            )
        # multi-million-row compares (x100): drop both frames NOW —
        # holding them to the next iteration doubles peak memory — and
        # recycle the DuckDB connection so its buffer pool can't
        # accumulate across the sweep
        del got, want
        gc.collect()
        try:
            con.close()
        except Exception:  # noqa: BLE001
            pass
        con = _fresh_con()
    # adjudicate rows-only records against their named companions: a
    # rows-only query whose companion ran IN THIS SWEEP without
    # hash-matching is a failure of the rows-only query too (the
    # companion is its entire correctness argument)
    for name, rec in detail.items():
        for comp in rec.get("audited_by", ()):
            crec = detail.get(comp)
            if crec is not None and crec.get("hash_match") is not True:
                rec["err"] = f"companion not green: {comp}"
                if name not in bad:
                    bad.append(name)
                say(f"FAIL {name}: companion {comp} did not hash-match")
    if detail_out:
        import json as _json

        with open(detail_out, "w") as f:
            _json.dump(detail, f, indent=1)
    return {"oracle_checked": checked, "rows_only": rows_only, "failures": bad}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="selfcheck")
    res = run_sweep(spark, sf_dir, only=only)
    spark.stop()
    bad = res["failures"]
    print(f"\n{len(bad)} failures" + (f": {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
