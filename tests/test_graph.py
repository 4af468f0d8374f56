"""Fixed-point PageRank (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import (
    SCALE,
    pagerank_fixed_point,
)


def _ranks(spark, vertices, edges, **kw):
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.id: r.rank_fp for r in pagerank_fixed_point(v, e, **kw).collect()
    }


def test_pagerank_structure(spark):
    """Symmetric pair ranks equal; connected nodes outrank isolated;
    total mass stays bounded by the scale."""
    ranks = _ranks(
        spark, [1, 2, 3], [(1, 2), (2, 1)], iterations=3
    )
    assert ranks[1] == ranks[2]  # symmetric roles → identical fixed point
    assert ranks[1] > ranks[3]  # isolated node keeps base rank only
    assert ranks[3] == (15 * SCALE) // (100 * 3)
    assert sum(ranks.values()) <= SCALE


def test_pagerank_hub_concentrates_rank(spark):
    """A star graph (all spokes point at a hub) must concentrate rank
    in the hub."""
    edges = [(s, 99) for s in range(1, 6)]
    ranks = _ranks(spark, list(range(1, 6)) + [99], edges, iterations=3)
    spoke = ranks[1]
    assert all(ranks[s] == spoke for s in range(2, 6))
    assert ranks[99] > 3 * spoke


def test_pagerank_exact_two_node_hand_computation(spark):
    """Bit-exact against the hand-unrolled integer recurrence for the
    2-cycle: every engine (and the DuckDB oracle) must produce THIS."""
    n, scale = 2, SCALE
    r = scale // n
    for _ in range(3):
        r = (15 * scale) // (100 * n) + (85 * (r // 1)) // 100
    ranks = _ranks(spark, [1, 2], [(1, 2), (2, 1)], iterations=3)
    assert ranks[1] == ranks[2] == r


def test_pagerank_builds_lazily(spark):
    """PageRank deliberately carries NO localCheckpoint pins (r8
    measurement: pins were 4.7x slower under the bench methodology —
    ReuseExchange/AQE stage reuse already dedupes the repeated edge
    subtree within one execution, while each pin materializes its
    upstream stages eagerly per DataFrame build). Building the plan
    must therefore run ZERO jobs (registry lazy-build rule)."""
    v = spark.range(100).select(F.col("id"))
    e = spark.createDataFrame([(1, 2)], "src long, dst long")

    # DAGScheduler's monotone job counter (the registry probe's form):
    # counts EVERY submitted job regardless of job group or the UI's
    # retained-job window — statusTracker().getJobIdsForGroup() missed
    # grouped jobs and truncated in long sessions (r8 advice item)
    def n_jobs() -> int:
        return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

    before = n_jobs()
    pagerank_fixed_point(v, e, iterations=2)
    after = n_jobs()
    assert after == before, "building the pagerank plan ran driver jobs"


def test_weighted_pagerank_favors_strong_edges(spark):
    """With node 1 tied strongly to 2 and weakly to 3 (1→2 weight 9×
    1→3), node 2 must out-rank node 3; the unweighted variant ranks
    them equally."""
    from pyspark.sql import functions as F

    v = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    edges = spark.createDataFrame(
        [(1, 2, 900), (2, 1, 900), (1, 3, 100), (3, 1, 100)],
        "src long, dst long, w long",
    )
    weighted = {
        r.id: r.rank_fp
        for r in pagerank_fixed_point(
            v, edges, iterations=3, weight_col="w"
        ).collect()
    }
    assert weighted[2] > weighted[3]
    unweighted = {
        r.id: r.rank_fp
        for r in pagerank_fixed_point(v, edges, iterations=3).collect()
    }
    assert unweighted[2] == unweighted[3]


def test_triangle_counts_k4_with_pendant(spark):
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(i, j) for i in range(1, 5) for j in range(1, 5) if i < j] + [(4, 5)],
        "src long, dst long",
    )
    got = {r.v: r.triangles for r in triangle_counts(edges).collect()}
    # K4: each vertex in C(3,2)=3 triangles; pendant vertex in none
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_direction_and_dup_invariant(spark):
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    tri = [(1, 2), (2, 3), (1, 3)]
    messy = tri + [(b, a) for a, b in tri] + tri  # reversed + duplicated
    got = {r.v: r.triangles for r in triangle_counts(
        spark.createDataFrame(messy, "src long, dst long")
    ).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_star_has_none(spark):
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    # a degree-100 hub with no closures: the orientation argument says
    # zero wedges form AT the hub, and the answer is zero triangles
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 101)], "src long, dst long"
    )
    assert triangle_counts(star).count() == 0


def _core(spark, edges, k):
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import k_core

    e = spark.createDataFrame(edges, "src long, dst long")
    return {r.v: r.core_degree for r in k_core(e, k=k).collect()}


def test_kcore_peels_tail_into_triangle(spark):
    """Triangle {1,2,3} with a pendant chain 3-4-5: the 2-core is the
    triangle alone — peeling must cascade (5 drops, THEN 4 drops),
    which a single degree-filter pass would miss."""
    got = _core(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], k=2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_k3_dissolves_cycle_keeps_clique(spark):
    """A 4-cycle has no 3-core; K4 survives intact with degree 3."""
    cycle = [(10, 11), (11, 12), (12, 13), (13, 10)]
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = _core(spark, cycle + k4, k=3)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_direction_and_dup_invariant(spark):
    """Duplicated and reversed edges canonicalize before peeling."""
    tri = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3)]
    got = _core(spark, tri, k=2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_empty_result(spark):
    got = _core(spark, [(1, 2), (2, 3)], k=2)
    assert got == {}


def test_kcore_driver_and_distributed_branches_agree(spark):
    """The r9 compact numpy peel (under the size gate) and the
    distributed loop (gate forced to 0) must reach the identical
    fixpoint — including the cascading pendant chain and a k above
    every degree."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 1), (5, 5), (4, 1)],
        "src long, dst long",
    )
    for k in (1, 2, 3, 9):
        a = sorted(
            (r.v, r.core_degree) for r in k_core(edges, k).collect()
        )
        b = sorted(
            (r.v, r.core_degree)
            for r in k_core(edges, k, driver_max_edges=0).collect()
        )
        assert a == b, f"k={k}: driver {a} != distributed {b}"


def test_link_prediction_scores_known_graph(spark):
    """Path graph 1-2-3-4 plus edge 2-4: the only candidate non-edges
    are (1,3) and (1,4), both via pivot 2 — check the wedge/anti-join
    arithmetic against exact hand-computed scores."""
    import math

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import (
        link_prediction,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 4)], "src long, dst long"
    )
    got = {
        (r.part_a, r.part_b): r
        for r in link_prediction(edges, k=10).collect()
    }
    # degrees: 1->1, 2->3, 3->2, 4->2
    # non-edges with a common neighbor: (1,3) via 2, (1,4) via 2
    assert set(got) == {(1, 3), (1, 4)}
    w2 = round(1_000_000.0 / math.log(3))
    assert got[(1, 3)].common_nbrs == 1
    assert got[(1, 3)].aa_micro == w2
    # jaccard(1,3) = 1 / (1 + 2 - 1)
    assert got[(1, 3)].jaccard_r6 == 0.5
    assert got[(1, 4)].jaccard_r6 == round(1 / 2, 6)


def test_link_prediction_hub_cap_drops_hub_wedges(spark):
    """max_pivot_degree excludes the hub as pivot: a star's leaf pairs
    disappear from the candidate set."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import (
        link_prediction,
    )

    star = [(0, i) for i in range(1, 6)]
    edges = spark.createDataFrame(star, "src long, dst long")
    full = link_prediction(edges, k=100)
    capped = link_prediction(edges, k=100, max_pivot_degree=4)
    assert full.count() == 10  # C(5,2) leaf pairs via the hub
    assert capped.count() == 0
