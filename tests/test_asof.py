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
