"""As-of join semantics on handcrafted rows (inclusive match, no-match
NULLs, per-key isolation)."""

import datetime as dt

from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "l1"),   # right at 09:00 → match
            (1, _ts("2024-01-01 09:00:00"), "l2"),   # right AT 09:00 → inclusive
            (1, _ts("2024-01-01 08:00:00"), "l3"),   # before any right → NULL
            (2, _ts("2024-01-01 10:00:00"), "l4"),   # other key's rights invisible
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 100.0),
            (1, _ts("2024-01-01 09:30:00"), 200.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r.tag: (r.asof_ts, r.asof_value)
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            value_cols=["value"],
        ).collect()
    }
    assert got["l1"] == (_ts("2024-01-01 09:30:00"), 200.0)
    assert got["l2"] == (_ts("2024-01-01 09:00:00"), 100.0)  # inclusive >=
    assert got["l3"] == (None, None)
    assert got["l4"] == (None, None)  # key isolation


def test_interval_join_semantics(spark):
    """Inclusive bounds, intervals spanning multiple buckets, no
    duplicate pairs, left mode keeps unmatched events, how guard."""
    import datetime as dt

    import pytest as _pytest

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import interval_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    events = spark.createDataFrame(
        [(0, ts(0)), (1, ts(30)), (2, ts(90)), (3, ts(500))],
        "event_id long, ts timestamp",
    )
    # interval A [0, 90] spans 2 hourly buckets incl. both boundaries;
    # B [60, 240] spans 4; C far away matches nothing
    iv = spark.createDataFrame(
        [("A", ts(0), ts(90)), ("B", ts(60), ts(240)), ("C", ts(1000), ts(1010))],
        "window_id string, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r.event_id, r.window_id)
        for r in interval_join(events, iv, "ts", "start_ts", "end_ts").collect()
    }
    assert got == {(0, "A"), (1, "A"), (2, "A"), (2, "B")}
    left = interval_join(events, iv, "ts", "start_ts", "end_ts", how="left")
    rows = left.collect()
    assert len(rows) == 5  # 4 matches + event 3 null-extended
    unmatched = [r for r in rows if r.window_id is None]
    assert [r.event_id for r in unmatched] == [3]
    with _pytest.raises(ValueError, match="how"):
        interval_join(events, iv, "ts", "start_ts", "end_ts", how="full")


def test_interval_join_guards(spark):
    """Bad bucket widths fail at call time (calendar units, sub-second,
    malformed), and a runaway sentinel interval fails with a clear
    error instead of materializing millions of bucket ids in one row."""
    import datetime as dt

    import pytest as _pytest

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import interval_join

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame([(0, t0)], "event_id long, ts timestamp")
    iv = spark.createDataFrame(
        [("A", t0, t0 + dt.timedelta(hours=1))],
        "window_id string, start_ts timestamp, end_ts timestamp",
    )
    for bad in ("1 month", "500 milliseconds", "hourly"):
        with _pytest.raises(ValueError):
            interval_join(events, iv, "ts", "start_ts", "end_ts", bucket=bad)
    # composite fixed widths are fine
    assert interval_join(events, iv, "ts", "start_ts", "end_ts",
                         bucket="1 hour 30 minutes").count() == 1
    sentinel = spark.createDataFrame(
        [("S", t0, dt.datetime(9999, 12, 31))],
        "window_id string, start_ts timestamp, end_ts timestamp",
    )
    with _pytest.raises(Exception, match="spans more than"):
        interval_join(events, sentinel, "ts", "start_ts", "end_ts").count()


def test_asof_join_forward_direction(spark):
    import pyspark.sql.functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", 1.0),  # before both: never forward-matched
            (1, "2024-01-01 10:00:00", 2.0),  # equal ts: inclusive match
            (1, "2024-01-01 11:00:00", 3.0),
        ],
        "user_id long, ts_s string, value double",
    ).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    got = {
        str(r.ts): r.asof_value
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            value_cols=["value"], direction="forward",
        ).collect()
    }
    assert got == {"2024-01-01 10:00:00": 2.0, "2024-01-01 12:00:00": None}


def test_asof_join_rejects_unknown_direction(spark):
    import pytest

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1)], "user_id long, ts long")
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(df, df, "user_id", "ts", "ts", [], direction="nearest")


def test_asof_join_tolerance_bounds_matches(spark):
    """A match farther than the tolerance becomes a non-match (all
    as-of columns NULL); matches inside the bound are untouched, and
    the bound never skips past the nearest row."""
    import datetime as dt

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import asof_join

    T = lambda s: dt.datetime.fromisoformat(f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}")
    clicks = spark.createDataFrame(
        [(1, T(100)), (1, T(500)), (2, T(50))],
        "user_id long, ts timestamp",
    )
    views = spark.createDataFrame(
        [(1, T(90), "v1"), (1, T(120), "v2"), (2, T(0), "v0")],
        "user_id long, ts timestamp, page string",
    )
    out = {
        (r.user_id, r.ts): r
        for r in asof_join(
            clicks, views, "user_id", "ts", "ts", ["page"],
            tolerance_seconds=30,
        ).collect()
    }
    # click@100: nearest backward view@90, 10s away -> matched
    assert out[(1, T(100))].asof_page == "v1"
    # click@500: nearest view@120, 380s away -> outside tolerance
    assert out[(1, T(500))].asof_page is None
    assert out[(1, T(500))].asof_ts is None
    # user 2: view@0 is 50s away -> outside 30s bound
    assert out[(2, T(50))].asof_page is None

    # same data without tolerance keeps all matches
    loose = {
        (r.user_id, r.ts): r
        for r in asof_join(clicks, views, "user_id", "ts", "ts", ["page"]).collect()
    }
    assert loose[(1, T(500))].asof_page == "v2"
    assert loose[(2, T(50))].asof_page == "v0"


def test_asof_join_rejects_negative_tolerance(spark):
    import pytest

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1)], "user_id long, ts long")
    with pytest.raises(ValueError, match="tolerance_seconds"):
        asof_join(df, df, "user_id", "ts", "ts", [], tolerance_seconds=-1)


def test_clicks_asof_bounded_matches_oracle(spark, duck):
    from dea05_e2e_kafka_streaming_pipeline_spark.queries import oracles, queries

    from tests.conftest import SF_DIR, assert_matches_oracle

    assert_matches_oracle(
        queries()["clicks_asof_views_bounded"](spark, SF_DIR),
        duck,
        oracles()["clicks_asof_views_bounded"],
    )


def test_cogroup_asof_equals_window_plan(spark):
    """asof_join_cogroup (cogrouped applyInPandas + merge_asof) must
    produce EXACTLY the window-plan asof_join's rows, both directions,
    with and without a tolerance bound — two independent
    implementations cross-checking each other."""
    import datetime as dt

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import (
        asof_join,
        asof_join_cogroup,
    )

    t0 = dt.datetime(2024, 1, 1)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    clicks = spark.createDataFrame(
        [(1, m(10)), (1, m(40)), (2, m(5)), (3, m(100))],
        "user_id long, ts timestamp",
    )
    views = spark.createDataFrame(
        [(1, m(0), 7), (1, m(35), 8), (2, m(50), 9)],
        "user_id long, ts timestamp, page long",
    )
    for direction in ("backward", "forward"):
        for tol in (None, 600.0):
            a = sorted(
                map(
                    tuple,
                    asof_join(
                        clicks, views, "user_id", "ts", "ts", ["page"],
                        direction=direction, tolerance_seconds=tol,
                    ).collect(),
                )
            )
            b = sorted(
                map(
                    tuple,
                    asof_join_cogroup(
                        clicks, views, "user_id", "ts", "ts", ["page"],
                        direction=direction, tolerance_seconds=tol,
                    ).collect(),
                )
            )
            assert a == b, (direction, tol)
