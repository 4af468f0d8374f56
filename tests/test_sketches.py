"""Count-min sketch: structure, overestimate contract, mergeability."""

from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
    cms_build,
    cms_estimates,
    cms_heavy_hitters,
)


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def test_cms_estimates_exact_when_no_collisions(spark):
    """Wide sketch (no collisions among 3 tokens): estimates == exact."""
    df = _docs(spark, ["a a a b", "b c", "a c c"])
    est = {r.tok: r.est_count for r in cms_estimates(df, width=4096, depth=4).collect()}
    assert est == {"a": 4, "b": 2, "c": 3}


def test_cms_never_undercounts_under_heavy_collisions(spark):
    """width=1: every token shares one bucket per row — estimates all
    collapse to the total token count, a gross over- but never
    under-estimate."""
    df = _docs(spark, ["x y", "y z z"])
    est = {r.tok: r.est_count for r in cms_estimates(df, width=1, depth=2).collect()}
    assert est == {"x": 5, "y": 5, "z": 5}


def test_cms_sketch_is_bounded_and_mergeable(spark):
    """The sketch never exceeds depth×width rows, and the sketch of a
    union equals the elementwise SUM of the parts' sketches — the
    property that makes it partition- and stream-mergeable."""
    a = _docs(spark, ["p q r r", "q p"])
    b = _docs(spark, ["r s", "s s p"])
    w, d = 8, 3
    sk_a = cms_build(a, width=w, depth=d)
    sk_b = cms_build(b, width=w, depth=d)
    merged = (
        sk_a.unionByName(sk_b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(a.unionByName(b), width=w, depth=d)
    assert direct.count() <= w * d
    got = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    want = {(r.row, r.bucket): r.cnt for r in direct.collect()}
    assert got == want


def test_cms_heavy_hitters_threshold(spark):
    df = _docs(spark, ["a a a a b", "a b c"])
    hh = {r.tok for r in cms_heavy_hitters(df, threshold=5, width=4096).collect()}
    assert hh == {"a"}


# ---------------------------------------------------------------------------
# Deterministic HLL
# ---------------------------------------------------------------------------

from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (  # noqa: E402
    hll_estimates,
    hll_merge,
    hll_partials,
    kmv_pair_overlap,
    kmv_sketch,
)


def _vals(spark, rows):
    return spark.createDataFrame(rows, "grp string, v long")


def test_hll_merge_equals_direct_sketch(spark):
    """Register associativity — the 100 TB contract: sketch per fine
    key, max-merge to a coarse key, and you get EXACTLY the registers
    of sketching the coarse key directly."""
    rows = [(f"g{i % 4}", i * 37) for i in range(500)]
    df = _vals(spark, rows).withColumn(
        "coarse", F.substring("grp", 1, 1)
    )  # all groups share coarse key "g"
    fine = hll_partials(df, ["coarse", "grp"], "v", p=5)
    merged = hll_merge(fine, ["coarse"])
    direct = hll_partials(df, ["coarse"], "v", p=5)
    got = {(r.coarse, r.reg_idx): r.reg_rho for r in merged.collect()}
    want = {(r.coarse, r.reg_idx): r.reg_rho for r in direct.collect()}
    assert got == want


def test_hll_estimate_accuracy(spark):
    """Estimate within 5 relative standard errors of truth on both
    estimator branches (linear counting AND raw harmonic mean)."""
    import math

    for n, p in ((40, 7), (5000, 7)):  # LC branch, raw branch
        df = _vals(spark, [("g", i * 1315423911 % 10**9) for i in range(n)])
        est = hll_estimates(hll_partials(df, ["grp"], "v", p=p), ["grp"], p=p)
        got = est.collect()[0].est_distinct_r4
        rse = 1.04 / math.sqrt(1 << p)
        assert abs(got - n) / n < 5 * rse, (n, p, got)


def test_hll_duplicates_do_not_move_registers(spark):
    """Distinctness: replicating every value 7× leaves the register
    table untouched."""
    base = [("g", i) for i in range(200)]
    df1 = _vals(spark, base)
    df7 = _vals(spark, base * 7)
    r1 = sorted(
        (r.reg_idx, r.reg_rho)
        for r in hll_partials(df1, ["grp"], "v", p=6).collect()
    )
    r7 = sorted(
        (r.reg_idx, r.reg_rho)
        for r in hll_partials(df7, ["grp"], "v", p=6).collect()
    )
    assert r1 == r7


# ---------------------------------------------------------------------------
# KMV / theta overlap
# ---------------------------------------------------------------------------


def test_kmv_exact_mode_small_sets(spark):
    """Sets smaller than k: the sketch IS the set — union and
    intersection estimates are exact."""
    rows = [("a", v) for v in range(10)] + [("b", v) for v in range(5, 20)]
    sk = kmv_sketch(_vals(spark, rows), "grp", "v", k=64)
    out = kmv_pair_overlap(sk, k=64).collect()[0]
    assert out.n_merged == 20
    assert out.est_union_r4 == 20.0
    assert out.est_inter_r4 == 5.0


def test_kmv_theta_mode_estimates_overlap(spark):
    """Large sets with 50% planted overlap: estimates land within the
    sketch's sampling tolerance (k=256 → rse ≈ 1/√k ≈ 6%; allow 5×)."""
    k = 256
    a = [("a", v) for v in range(4000)]
    b = [("b", v) for v in range(2000, 6000)]
    sk = kmv_sketch(_vals(spark, a + b), "grp", "v", k=k)
    out = kmv_pair_overlap(sk, k=k).collect()[0]
    assert abs(out.est_union_r4 - 6000) / 6000 < 0.3
    assert abs(out.est_inter_r4 - 2000) / 2000 < 0.4


def test_kmv_sketch_bounded(spark):
    """Never more than k rows per key, ranked by hash ascending."""
    rows = [("a", v) for v in range(1000)]
    sk = kmv_sketch(_vals(spark, rows), "grp", "v", k=32).collect()
    assert len(sk) == 32
    hvs = [r.hv for r in sorted(sk, key=lambda r: r.rk)]
    assert hvs == sorted(hvs)


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    """One-sided error: every inserted key probes positive; the
    false-positive rate over disjoint probes stays within 3x the
    analytic (1-e^{-kn/m})^k bound (slack for md5-bucket variance)."""
    import math

    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    n, m, k = 500, 8192, 3
    members = spark.range(0, n).select(F.col("id").alias("key"))
    outsiders = spark.range(1_000_000, 1_000_000 + 2000).select(
        F.col("id").alias("key")
    )
    words = bloom_build(members, "key", m_bits=m, k=k)
    assert words.count() <= m // 32

    in_probe = bloom_probe(members, words, "key", m_bits=m, k=k)
    assert in_probe.filter(~F.col("bloom_maybe")).count() == 0

    out_probe = bloom_probe(outsiders, words, "key", m_bits=m, k=k)
    fp = out_probe.filter(F.col("bloom_maybe")).count()
    bound = (1 - math.exp(-k * n / m)) ** k
    assert fp / 2000 <= 3 * bound, (fp, bound)


def test_bloom_build_is_partitioning_invariant(spark):
    """The word table is a bit_or fold — any partitioning of the same
    keys produces the identical filter (mergeable-sketch discipline)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        bloom_build,
    )

    keys = spark.range(0, 300).select(F.col("id").alias("key"))
    a = {
        (r.word_idx, r.bits)
        for r in bloom_build(keys.repartition(1), "key").collect()
    }
    b = {
        (r.word_idx, r.bits)
        for r in bloom_build(keys.repartition(17), "key").collect()
    }
    assert a == b


def test_cms_external_candidate_token_estimates_zero(spark):
    """ADVICE r4 (medium): a candidate token never seen by the corpus
    (the at-scale path — external query tokens) must estimate 0 (or a
    small collision overcount), never lose counter rows to an inner
    join or vanish from the output."""
    df = _docs(spark, ["a a b"])
    cand = spark.createDataFrame([("zz_unseen",), ("a",)], "tok string")
    est = {
        r.tok: r.est_count
        for r in cms_estimates(df, width=4096, depth=4, candidates=cand).collect()
    }
    assert set(est) == {"zz_unseen", "a"}
    assert est["a"] == 2
    assert est["zz_unseen"] == 0  # wide sketch: no collisions


def test_bloom_probe_null_key_surfaces_false(spark):
    """ADVICE r4 (low): a NULL probe key never equi-joins — it must
    surface bloom_maybe=false, not disappear from the output."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame([("k1",), ("k2",)], "key string")
    words = bloom_build(members, "key", m_bits=1024, k=3)
    probes = spark.createDataFrame([("k1",), (None,)], "key string")
    got = {
        r.key: r.bloom_maybe
        for r in bloom_probe(probes, words, "key", m_bits=1024, k=3).collect()
    }
    assert got == {"k1": True, None: False}
