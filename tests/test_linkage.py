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


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (sorted_neighborhood_linkage)
# ---------------------------------------------------------------------------


def test_snb_window_and_partition_semantics(spark):
    """Candidates are EXACTLY the pairs within `window` rank positions
    that agree on partition_on — including pairs straddling a bucket
    boundary (the band join's whole reason for the explode), and
    excluding rank-adjacent pairs from different partitions."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        sorted_neighborhood_linkage,
    )

    # oslo names sort a..f (ranks 1..6); bergen's "a zz" is rank-adjacent
    # to oslo's block start but must never pair with it
    rows = [
        (1, "oslo", "aaa", 1.0),
        (2, "oslo", "bbb", 1.0),
        (3, "oslo", "ccc", 1.0),
        (4, "oslo", "ddd", 1.0),
        (5, "oslo", "eee", 1.0),
        (6, "oslo", "fff", 1.0),
        (7, "bergen", "azz", 1.0),
    ]
    got = sorted_neighborhood_linkage(
        _people(spark, rows),
        sort_on=["name"],
        partition_on=["city"],
        comparisons=[FieldComparison("age", "age", "age", within(2.0), 1, 0)],
        id_col="id",
        min_score=0,
        window=2,
    ).collect()
    pairs = {(r.left_id, r.right_id) for r in got}
    # every oslo pair with rank distance <= 2, nothing else
    assert pairs == {
        (1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5), (4, 6), (5, 6),
    }
    assert all(r.score == 1 for r in got)


def test_snb_asymmetric_comparison_columns(spark):
    """A FieldComparison with left_col != right_col (explicitly allowed
    by the dataclass, e.g. comparing a record's name against the OTHER
    record's alias in a self-linkage) must resolve: the projection has
    to retain right_col too, not just left_col (round-5 advice)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        exact,
        sorted_neighborhood_linkage,
    )

    df = spark.createDataFrame(
        [
            (1, "ann", "anna"),
            (2, "anna", "ann"),
            (3, "bob", "zzz"),
        ],
        "id long, name string, alias string",
    )
    got = sorted_neighborhood_linkage(
        df,
        sort_on=["name"],
        comparisons=[FieldComparison("xname", "name", "alias", exact, 2, -1)],
        id_col="id",
        min_score=-10,
        window=2,
    ).collect()
    scores = {(r.left_id, r.right_id): r.score for r in got}
    # rank order by name: ann(1) < anna(2) < bob(3)
    # (1,2): l.name='ann' vs r.alias='ann' -> agree -> 2
    assert scores[(1, 2)] == 2
    assert scores[(2, 3)] == -1
    assert scores[(1, 3)] == -1


def test_snb_candidate_volume_is_linear(spark):
    """At most n*window candidate pairs regardless of block sizes —
    the contract that distinguishes SNB from equality blocking (one
    fat block would give ~n²/2 pairs under blocked_linkage)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        sorted_neighborhood_linkage,
    )

    n, w = 300, 7
    rows = [(i, "same", f"name{i:04d}", float(i % 10)) for i in range(n)]
    got = sorted_neighborhood_linkage(
        _people(spark, rows),
        sort_on=["name"],
        partition_on=["city"],
        comparisons=[FieldComparison("age", "age", "age", within(100.0), 1, 0)],
        id_col="id",
        min_score=0,
        window=w,
    ).count()
    # exact: every rank i pairs with min(w, n-1-i) successors
    assert got == sum(min(w, n - 1 - i) for i in range(n))
    assert got <= n * w


def test_snb_scoring_matches_blocked_linkage_tail(spark):
    """SNB reuses the same Fellegi-Sunter scoring: a pair that is both
    rank-adjacent and block-co-resident must score identically under
    both generators (points columns included)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        blocked_linkage,
        sorted_neighborhood_linkage,
    )

    rows = [(1, "oslo", "anna lind", 30.0), (2, "oslo", "anna lund", 31.0)]
    df = _people(spark, rows)
    snb = sorted_neighborhood_linkage(
        df, sort_on=["name"], partition_on=["city"], comparisons=CMP,
        id_col="id", min_score=-100, window=3,
    ).collect()
    blocked = blocked_linkage(
        df, df, ["city"], CMP, "id", "id", min_score=-100,
        dedup_self_pairs=True,
    ).collect()
    key = lambda r: (r.left_id, r.right_id, r.score, r.pts_name, r.pts_age)  # noqa: E731
    assert sorted(map(key, snb)) == sorted(map(key, blocked))


def test_snb_plan_has_no_single_partition_window(spark):
    """The global rank must come from the range-shuffle scaffold — a
    Window operator (Exchange SinglePartition, one task sorts the
    world) anywhere in the SNB plan is the 100 TB anti-pattern."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        sorted_neighborhood_linkage,
    )

    rows = [(i, "same", f"n{i}", 1.0) for i in range(10)]
    df = sorted_neighborhood_linkage(
        _people(spark, rows),
        sort_on=["name"],
        partition_on=["city"],
        comparisons=CMP,
        id_col="id",
        min_score=0,
        window=2,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # r9 size-adaptive numbering: a gated input this small takes the
    # explicit Coalesce(1) JVM branch; above the gate the scaffold's
    # range shuffle appears instead — either way, never a Window
    assert "Coalesce 1" in plan or "rangepartitioning" in plan.lower()


def test_snb_window_must_be_positive(spark):
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        sorted_neighborhood_linkage,
    )

    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_linkage(
            _people(spark, [(1, "oslo", "a", 1.0)]),
            sort_on=["name"], partition_on=["city"], comparisons=CMP,
            id_col="id", min_score=0, window=0,
        )
