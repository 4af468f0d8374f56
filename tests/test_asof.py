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
