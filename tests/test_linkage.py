"""Blocked Fellegi–Sunter record linkage (operators/linkage.py)."""

import pytest

from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
    FieldComparison,
    blocked_linkage,
    exact,
    prefix,
    within,
)


def _people(spark, rows):
    return spark.createDataFrame(
        rows, "id long, city string, name string, age double"
    )


CMP = [
    FieldComparison("name", "name", "name", prefix(4), 20, -5),
    FieldComparison("age", "age", "age", within(2.0), 10, -10),
]


def test_linkage_scores_and_threshold(spark):
    left = _people(spark, [(1, "oslo", "johan berg", 40.0)])
    right = _people(
        spark,
        [
            (2, "oslo", "johanna b", 41.0),  # both agree: 30
            (3, "oslo", "johanna b", 90.0),  # name only: 10
            (4, "bergen", "johan berg", 40.0),  # other block: no pair
        ],
    )
    got = {
        (r.left_id, r.right_id): (r.score, r.pts_name, r.pts_age)
        for r in blocked_linkage(
            left, right, ["city"], CMP, "id", "id", min_score=0
        ).collect()
    }
    assert got == {(1, 2): (30, 20, 10), (1, 3): (10, 20, -10)}
    kept = blocked_linkage(left, right, ["city"], CMP, "id", "id", min_score=25)
    assert [(r.left_id, r.right_id) for r in kept.collect()] == [(1, 2)]


def test_linkage_null_fields_are_neutral(spark):
    left = _people(spark, [(1, "oslo", "johan berg", None)])
    right = _people(spark, [(2, "oslo", "johan arnt", 33.0)])
    row = blocked_linkage(
        left, right, ["city"], CMP, "id", "id", min_score=-100
    ).collect()[0]
    assert row.pts_age == 0 and row.pts_name == 20 and row.score == 20


def test_linkage_self_dedup_halves_pairs(spark):
    t = _people(
        spark,
        [(1, "oslo", "anna lind", 30.0), (2, "oslo", "anna lund", 31.0)],
    )
    pairs = blocked_linkage(
        t, t, ["city"], CMP, "id", "id", min_score=0, dedup_self_pairs=True
    ).collect()
    assert [(r.left_id, r.right_id) for r in pairs] == [(1, 2)]


def test_linkage_requires_blocking(spark):
    t = _people(spark, [(1, "oslo", "a", 1.0)])
    with pytest.raises(ValueError):
        blocked_linkage(t, t, [], CMP, "id", "id", min_score=0)


def test_exact_predicate_comparison(spark):
    cmp_exact = [FieldComparison("city2", "name", "name", exact, 7, -3)]
    left = _people(spark, [(1, "x", "same", 1.0)])
    right = _people(spark, [(2, "x", "same", 9.0), (3, "x", "diff", 9.0)])
    got = {
        r.right_id: r.score
        for r in blocked_linkage(
            left, right, ["city"], cmp_exact, "id", "id", min_score=-100
        ).collect()
    }
    assert got == {2: 7, 3: -3}
