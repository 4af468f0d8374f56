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


def test_jaro_winkler_classic_values_and_duckdb_parity(spark, duck):
    """Textbook pairs pin the algorithm (MARTHA/MARHTA 0.961,
    DWAYNE/DUANE 0.84, empty -> 0, identical -> 1); then 300 random
    string pairs must match DuckDB's native jaro_winkler_similarity
    bit-for-bit — the property that lets registry queries keep a
    hash-matching oracle."""
    import random
    import string as _string

    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        jaro_winkler,
    )

    classic = [
        ("MARTHA", "MARHTA"),
        ("DWAYNE", "DUANE"),
        ("DIXON", "DICKSONX"),
        ("", "abc"),
        ("", ""),
        ("same", "same"),
    ]
    rng = random.Random(42)
    rand_pairs = [
        (
            "".join(rng.choices(_string.ascii_lowercase[:6] + "# ", k=rng.randint(0, 12))),
            "".join(rng.choices(_string.ascii_lowercase[:6] + "# ", k=rng.randint(0, 12))),
        )
        for _ in range(300)
    ]
    pairs = classic + rand_pairs
    df = spark.createDataFrame(pairs, "s1 string, s2 string")
    got = {
        (r.s1, r.s2): r.sim
        for r in df.select(
            "s1", "s2", F.round(jaro_winkler("s1", "s2"), 9).alias("sim")
        ).collect()
    }
    assert got[("MARTHA", "MARHTA")] == pytest.approx(0.961111111, abs=1e-9)
    assert got[("DWAYNE", "DUANE")] == pytest.approx(0.84, abs=1e-9)
    assert got[("", "abc")] == 0.0 and got[("", "")] == 0.0
    assert got[("same", "same")] == 1.0

    for s1, s2 in pairs:
        want = duck.execute(
            "SELECT round(jaro_winkler_similarity(?, ?), 9)", [s1, s2]
        ).fetchone()[0]
        assert got[(s1, s2)] == want, (s1, s2, got[(s1, s2)], want)
