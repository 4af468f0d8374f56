"""Versioned snapshot log (sources/txlog.py): time travel, history,
logical overwrite, and vacuum on plain parquet."""

from __future__ import annotations

import os

from dea05_e2e_kafka_streaming_pipeline_spark.sources.txlog import (
    commit_snapshot,
    read_snapshot,
    snapshot_history,
    snapshot_versions,
    vacuum_snapshots,
)


def test_append_versions_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = commit_snapshot(spark.range(0, 100), t)
    v1 = commit_snapshot(spark.range(100, 150), t, mode="append")
    assert (v0, v1) == (0, 1)
    assert read_snapshot(spark, t, version=0).count() == 100
    assert read_snapshot(spark, t, version=1).count() == 150
    assert read_snapshot(spark, t).count() == 150  # latest by default


def test_overwrite_is_logical_old_versions_survive(spark, tmp_path):
    t = str(tmp_path / "tbl2")
    commit_snapshot(spark.range(0, 100), t)
    commit_snapshot(spark.range(0, 7), t, mode="overwrite")
    assert read_snapshot(spark, t).count() == 7
    assert read_snapshot(spark, t, version=0).count() == 100  # still readable
    hist = snapshot_history(t)
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[1]["mode"] == "overwrite"
    assert all(h["added_bytes"] > 0 for h in hist)


def test_vacuum_drops_only_superseded_files(spark, tmp_path):
    t = str(tmp_path / "tbl3")
    commit_snapshot(spark.range(0, 50), t)                    # v0
    commit_snapshot(spark.range(50, 80), t, mode="append")    # v1 (reuses v0 files)
    commit_snapshot(spark.range(0, 9), t, mode="overwrite")   # v2
    removed = vacuum_snapshots(t, keep_last=1)
    assert removed  # v0/v1 data gone
    assert snapshot_versions(t) == [2]
    assert read_snapshot(spark, t).count() == 9  # survivor intact
    # vacuumed files really deleted from disk
    for f in removed:
        assert not os.path.exists(os.path.join(t, f))


def test_reader_snapshot_isolation(spark, tmp_path):
    """A reader planned against version N does not see a later commit."""
    t = str(tmp_path / "tbl4")
    commit_snapshot(spark.range(0, 10), t)
    df_v0 = read_snapshot(spark, t, version=0)
    commit_snapshot(spark.range(0, 1000), t, mode="overwrite")
    assert df_v0.count() == 10  # plan pinned to v0's file list
    assert read_snapshot(spark, t).count() == 1000
