"""Time-series subsequence search (operators/timeseries.py)."""

import datetime as dt

import pytest

from dea05_e2e_kafka_streaming_pipeline_spark.operators.timeseries import (
    subsequence_search,
)

BASE = dt.datetime(2024, 1, 1)


def _series(spark, per_user):
    rows = []
    eid = 0
    for u, vals in per_user.items():
        for i, v in enumerate(vals):
            rows.append((u, BASE + dt.timedelta(minutes=i), float(v), eid))
            eid += 1
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )


def test_planted_exact_match_ranks_first(spark):
    pattern = [5.0, 1.0, 9.0]
    df = _series(
        spark,
        {
            1: [100, 5, 1, 9, 100],  # exact match starting at index 1
            2: [5, 1, 8, 50, 60],  # near match at 0 (dist2 = 1)
        },
    )
    out = subsequence_search(
        df, pattern, k=3, tiebreak_col="event_id"
    ).collect()
    assert out[0].user_id == 1 and out[0].dist2 == 0.0
    assert out[0].start_ts == BASE + dt.timedelta(minutes=1)
    assert out[1].user_id == 2 and out[1].dist2 == 1.0


def test_tail_windows_excluded_and_validation(spark):
    df = _series(spark, {1: [1, 2]})
    # series shorter than the pattern -> no complete window
    assert subsequence_search(df, [1.0, 2.0, 3.0], tiebreak_col="event_id").count() == 0
    # length-2 pattern -> exactly one complete window
    rows = subsequence_search(df, [1.0, 2.0], tiebreak_col="event_id").collect()
    assert len(rows) == 1 and rows[0].dist2 == 0.0
    with pytest.raises(ValueError):
        subsequence_search(df, [])


def test_distance_is_fold_order_exact(spark):
    """Repartitioning cannot change any distance: decimal accumulation
    is order-insensitive (the discipline every hash-checked operator
    follows)."""
    vals = [((i * 37) % 100) / 7.0 for i in range(30)]
    df = _series(spark, {1: vals, 2: vals[::-1]})
    pattern = [3.0, 1.5, 4.25, 2.0]
    a = subsequence_search(df, pattern, k=50, tiebreak_col="event_id").collect()
    b = subsequence_search(
        df.repartition(17, "event_id"), pattern, k=50, tiebreak_col="event_id"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_centered_search_is_offset_invariant(spark):
    """center=True matches shape regardless of vertical offset: a
    window that is the pattern shifted by +1000 scores dist2=0, while
    the uncentered search ranks it far away."""
    pattern = [5.0, 1.0, 9.0]
    shifted = [v + 1000.0 for v in pattern]
    df = _series(spark, {1: [3.0, *shifted, 3.0], 2: [50.0, 51.0, 52.0, 53.0, 54.0]})
    cen = subsequence_search(
        df, pattern, k=1, tiebreak_col="event_id", center=True
    ).collect()
    assert cen[0].user_id == 1 and cen[0].dist2 == 0.0
    assert cen[0].start_ts == BASE + dt.timedelta(minutes=1)
    raw = subsequence_search(df, pattern, k=1, tiebreak_col="event_id").collect()
    assert raw[0].dist2 > 0.0  # no exact raw match exists anywhere


def test_seasonal_decompose_linear_series_has_zero_residual(spark):
    """On a perfectly linear daily series the centered MA reproduces the
    value exactly, so detrended/seasonal/residual are all zero and the
    trend equals the value on every interior day."""
    import datetime as dt

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    base = dt.date(1995, 1, 1)
    rows = [
        (base + dt.timedelta(days=i), (i + 1) * 100) for i in range(14)
    ]
    daily = spark.createDataFrame(rows, "day date, cents long")
    got = {
        r.d: r
        for r in seasonal_decompose(daily, "day", "cents").collect()
    }
    assert len(got) == 14
    first = got[base]
    assert first.trend_r4 is None          # partial frame at the edge
    assert first.value == 1.0
    mid = got[base + dt.timedelta(days=7)]
    assert mid.trend_r4 == mid.value == 8.0
    assert mid.seasonal_r4 == 0.0
    assert mid.residual_r4 == 0.0
    assert mid.phase == 0


def test_seasonal_decompose_recovers_planted_weekly_bump(spark):
    """A flat series with a +70-cent bump every 7th day: the bump day's
    seasonal component absorbs the bump (6/7 of it — phase means of the
    detrended series), leaving residuals constant across bump weeks."""
    import datetime as dt

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    base = dt.date(1995, 1, 1)
    rows = [
        (base + dt.timedelta(days=i), 700 + (70 if i % 7 == 0 else 0))
        for i in range(28)
    ]
    daily = spark.createDataFrame(rows, "day date, cents long")
    out = seasonal_decompose(daily, "day", "cents").collect()
    bump = [r for r in out if r.phase == 0 and r.trend_r4 is not None]
    flat = [r for r in out if r.phase == 3 and r.trend_r4 is not None]
    assert bump and flat
    # all interior trend values equal: exactly one bump inside every
    # 7-day frame -> trend = 7.10 everywhere
    assert {r.trend_r4 for r in out if r.trend_r4 is not None} == {7.1}
    assert all(r.seasonal_r4 > 0.5 for r in bump)      # ~ +0.6 of the bump
    assert all(r.seasonal_r4 < 0.0 for r in flat)      # flat days dip
    assert len({r.residual_r4 for r in bump}) == 1     # perfectly periodic


def test_kaplan_meier_textbook_curve(spark):
    """Durations 1E,2C,3E,4C,5E: S = 0.8, 0.8, 0.8*(2/3), same, then 0
    when the last at-risk subject events (d == n -> exact zero, NULL
    log-survival)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.timeseries import (
        kaplan_meier,
    )

    life = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)], "t int, event int"
    )
    got = {r.t: r for r in kaplan_meier(life).collect()}
    assert got[1].n_at_risk == 5 and got[1].n_events == 1
    assert got[1].surv_r6 == 0.8
    assert got[2].surv_r6 == 0.8 and got[2].n_censored == 1
    assert got[3].n_at_risk == 3
    assert got[3].surv_r6 == round(0.8 * 2 / 3, 6) or abs(
        got[3].surv_r6 - 0.533333
    ) < 2e-6
    assert got[4].surv_r6 == got[3].surv_r6
    assert got[5].n_at_risk == 1 and got[5].surv_r6 == 0.0
    assert got[5].log_surv_nano is None
    assert got[1].log_surv_nano is not None


def test_conformal_interval_exact_quantile_and_coverage(spark):
    """Hand-built series: constant weekly pattern for calibration, so
    all calibration scores are a known set; verify qhat is the exact
    order statistic and coverage flags are right."""
    import datetime as dt

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.timeseries import (
        seasonal_naive_conformal,
    )

    base = dt.date(1999, 10, 1)
    # one continuous daily series: weekly level + a mod-3 wobble, so
    # every |value(t) - value(t-7)| is in {1, 2}; days 0-69 calibrate,
    # days 70-76 evaluate, day 73 carries a planted 5000-cent spike
    rows = [
        (
            base + dt.timedelta(days=i),
            1000 + (i % 7) * 10 + (i % 3) + (5000 if i == 73 else 0),
        )
        for i in range(77)
    ]
    daily = spark.createDataFrame(rows, "day date, cents long")
    cutoff = base + dt.timedelta(days=70)
    out = seasonal_naive_conformal(
        daily, cutoff=cutoff.isoformat()
    ).collect()
    assert len(out) == 7
    covered = {r.d: r.covered for r in out}
    assert covered[base + dt.timedelta(days=73)] is False  # the spike
    assert sum(1 for v in covered.values() if v) == 6      # rest inside
    for r in out:
        assert r.lower <= r.pred <= r.upper
        # symmetric widening (compare in cents: the dollar values are
        # exact but their double differences are not)
        assert round((r.upper - r.pred) * 100) == round(
            (r.pred - r.lower) * 100
        )
    # qhat is the exact order statistic of the {1,2} score set: 2 cents
    inside = [r for r in out if r.covered][0]
    assert round((inside.upper - inside.pred) * 100) == 2
