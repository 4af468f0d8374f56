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


def test_incremental_linkage_against_committed_master(spark, tmp_path):
    """Incremental ER — the streaming-shaped flow: a committed golden
    master (snapshot log v0), a new record batch blocked-linked against
    it, each new record assigned to its best-scoring master entity at
    or above threshold (else it founds a new entity), and the updated
    golden table committed as v1 — linkage + txlog composing end to
    end, with time travel preserving the pre-merge master."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.txlog import (
        commit_snapshot,
        read_snapshot,
        snapshot_versions,
    )

    cust = load_table(spark, "/root/testdata/sf0.01", "customer")
    master = cust.filter(F.col("c_custkey") < 1000).withColumn(
        "entity_id", F.col("c_custkey")
    )
    batch = cust.filter(F.col("c_custkey") >= 1000)
    table = str(tmp_path / "golden")
    commit_snapshot(master, table)

    CMPS = [
        FieldComparison("segment", "c_mktsegment", "c_mktsegment", exact, 16, -4),
        FieldComparison("balance", "c_acctbal", "c_acctbal", within(100.0), 24, -8),
    ]
    scored = blocked_linkage(
        batch,
        read_snapshot(spark, table),
        block_on=["c_nationkey"],
        comparisons=CMPS,
        left_id="c_custkey",
        right_id="entity_id",
        min_score=30,
    )
    best = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("left_id").orderBy(
                    F.desc("score"), F.col("right_id")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select(F.col("left_id").alias("c_custkey"), F.col("right_id").alias("entity_id"))
    )
    assigned = batch.join(best, "c_custkey", "left").withColumn(
        "entity_id", F.coalesce("entity_id", F.col("c_custkey"))
    )
    commit_snapshot(
        read_snapshot(spark, table).unionByName(assigned), table, mode="overwrite"
    )

    assert snapshot_versions(table) == [0, 1]
    v1 = read_snapshot(spark, table)
    assert v1.count() == cust.count()  # every record has a golden row
    n_master = master.count()
    absorbed = v1.filter(
        (F.col("c_custkey") >= 1000) & (F.col("entity_id") < 1000)
    ).count()
    founded = v1.filter(
        (F.col("c_custkey") >= 1000) & (F.col("entity_id") >= 1000)
    ).count()
    assert absorbed > 0 and founded > 0  # both outcomes occur
    assert absorbed + founded == batch.count()
    # time travel: the pre-merge master is intact at v0
    assert read_snapshot(spark, table, version=0).count() == n_master
