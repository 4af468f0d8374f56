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
