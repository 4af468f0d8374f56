"""Count-min sketch frequency estimation and heavy hitters.

The count-min sketch (Cormode & Muthukrishnan 2005) is the mergeable
frequency summary that replaces exact token counting when the
vocabulary doesn't fit anywhere: a ``depth × width`` counter matrix
where every item increments one counter per row (bucket chosen by that
row's hash) and an item's estimate is the MIN of its ``depth``
counters — always an overestimate, never an under.

Spark shape, designed for 100 TB:

- **Build** is ONE aggregation pass: explode tokens, fan each out to
  its ``depth`` (row, bucket) keys, groupBy-count. Map-side combine
  collapses every partition to at most ``depth × width`` partial rows
  before the shuffle, so shuffle volume is bounded by the sketch size
  (KBs) times the partition count — independent of corpus size. The
  result IS the sketch, as a DataFrame; summing two sketches
  elementwise merges them (property-tested), which is what makes the
  structure streaming- and partition-friendly.
- **Estimate / heavy hitters** joins candidate tokens against the
  sketch per row and takes ``min(count)``. The sketch is at most
  ``depth × width`` rows, so the join is a broadcast — candidates
  never shuffle.

Hash rows are md5-derived (``row:token`` → first 8 hex chars → int →
mod width): deterministic, engine-independent, and reproducible in
DuckDB SQL — so the whole pipeline (build → estimate → threshold) is
oracle-checkable, unlike sketch implementations with private seeds.

Reference scope: the reference engine has no sketches; this extends
the aggregation family (SURVEY §2.5) with the mergeable-summary tier
a large-scale pipeline needs (corpus token accounting, contamination
screens over unbounded vocabularies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import tokens

__all__ = [
    "cms_bucket",
    "cms_build",
    "cms_estimates",
    "cms_heavy_hitters",
]


def cms_bucket(tok: Column, row: int, width: int) -> Column:
    """Row ``row``'s bucket for a token: first 8 md5 hex chars of
    ``"row:token"`` as an unsigned 32-bit int, mod ``width``. Matches
    DuckDB's ``('0x' || substr(md5(...), 1, 8))::BIGINT % width``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), tok)), 1, 8), 16, 10
    ).cast("long")
    return (h % width).cast("int")


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` — at most
    ``depth × width`` rows regardless of input size. One explode + one
    aggregate; the fan-out to ``depth`` rows happens AFTER map-side
    combine has no chance to help (each token occurrence increments
    all rows), but the groupBy's partial aggregation still bounds the
    shuffle at ``depth × width`` rows per partition."""
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    fan = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_bucket(F.col("tok"), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    )
    return (
        fan.select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(
    df: DataFrame,
    sketch: DataFrame | None = None,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Frequency estimate per candidate token: ``min`` over the
    ``depth`` counters the token hashes to. ``candidates`` defaults to
    the corpus's distinct tokens (exact-pass convenience for testing);
    at scale you pass the stream of query tokens instead — the sketch
    side broadcasts either way."""
    if sketch is None:
        sketch = cms_build(df, text_col=text_col, width=width, depth=depth)
    if candidates is None:
        candidates = df.select(
            F.explode(tokens(F.col(text_col))).alias("tok")
        ).distinct()
    fan = candidates.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_bucket(F.col("tok"), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("tok", "rb.row", "rb.bucket")
    return (
        fan.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    threshold: int,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Tokens whose estimated count is ≥ ``threshold``. The
    overestimate property guarantees NO FALSE NEGATIVES: every true
    heavy hitter is returned (asserted by the zero-row
    `cms_false_negative_violations` registry row); collisions can add
    false positives, shrinking with ``width``."""
    est = cms_estimates(df, text_col=text_col, width=width, depth=depth)
    return est.filter(F.col("est_count") >= threshold)
