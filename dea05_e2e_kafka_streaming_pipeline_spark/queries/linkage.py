"""Registry queries: linkage family. Split from queries.py
(r4 verdict item 2); registration order within the family preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.queries._registry import (  # noqa: F401
    register,
)
from dea05_e2e_kafka_streaming_pipeline_spark.queries._shared import *  # noqa: F401,F403




@register(
    "linkage_customer_pairs",
    oracle="""
    WITH pairs AS (
      SELECT a.c_custkey AS left_id, b.c_custkey AS right_id,
        CASE WHEN a.c_mktsegment IS NULL OR b.c_mktsegment IS NULL THEN 0
             WHEN a.c_mktsegment = b.c_mktsegment THEN 16 ELSE -4
        END AS pts_segment,
        CASE WHEN a.c_acctbal IS NULL OR b.c_acctbal IS NULL THEN 0
             WHEN abs(a.c_acctbal - b.c_acctbal) <= 100.0 THEN 24 ELSE -8
        END AS pts_balance,
        CASE WHEN a.c_name IS NULL OR b.c_name IS NULL THEN 0
             WHEN right(a.c_name, 2) = right(b.c_name, 2) THEN 8 ELSE -2
        END AS pts_name_suffix
      FROM customer a JOIN customer b
        ON a.c_nationkey IS NOT DISTINCT FROM b.c_nationkey
       AND a.c_custkey < b.c_custkey
    )
    SELECT left_id, right_id, pts_segment, pts_balance, pts_name_suffix,
           pts_segment + pts_balance + pts_name_suffix AS score
    FROM pairs
    WHERE pts_segment + pts_balance + pts_name_suffix >= 30
    """,
)
def q_linkage_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi–Sunter, operators/
    linkage.py): likely-same-entity customer pairs blocked on nation,
    scored by integer match points — segment agreement +16/−4, account
    balance within 100 +24/−8, name-suffix agreement +8/−2, NULLs
    neutral — emitting pairs scoring ≥ 30. Blocking bounds pair volume
    to Σ per-nation block²; scoring is a projection on the joined row;
    integer points keep the score oracle-exact. The oracle replays the
    identical blocked join + CASE arithmetic in SQL."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        FieldComparison,
        blocked_linkage,
        exact,
        within,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    cust = load_table(spark, sf_dir, "customer")
    suffix2 = lambda l, r: F.substring(l, -2, 2) == F.substring(r, -2, 2)  # noqa: E731,E741
    return blocked_linkage(
        cust,
        cust,
        block_on=["c_nationkey"],
        comparisons=[
            FieldComparison("segment", "c_mktsegment", "c_mktsegment", exact, 16, -4),
            FieldComparison("balance", "c_acctbal", "c_acctbal", within(100.0), 24, -8),
            FieldComparison("name_suffix", "c_name", "c_name", suffix2, 8, -2),
        ],
        left_id="c_custkey",
        right_id="c_custkey",
        min_score=30,
        dedup_self_pairs=True,
    )




@register(
    "jaro_winkler_customer_names",
    oracle="""
    SELECT a.c_custkey AS k1, b.c_custkey AS k2,
           round(jaro_winkler_similarity(a.c_name, b.c_name), 9)
             AS name_sim,
           round(jaro_winkler_similarity(a.c_mktsegment, b.c_mktsegment), 9)
             AS seg_sim
    FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
    """,
)
def q_jaro_winkler_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler name/address comparators over a blocked candidate
    set (consecutive customer keys as the stand-in block): the engine's
    Arrow-vectorized UDF hash-matches DuckDB's NATIVE
    jaro_winkler_similarity on every pair — near-identical names
    (shared 'Customer#...' prefixes) exercise the Winkler prefix boost,
    cross-segment pairs exercise the low-similarity path."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        jaro_winkler,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    c = load_table(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("k1"),
        F.col("c_name").alias("n1"),
        F.col("c_mktsegment").alias("a1"),
    )
    b = c.select(
        (F.col("c_custkey") - 1).alias("k1"),
        F.col("c_custkey").alias("k2"),
        F.col("c_name").alias("n2"),
        F.col("c_mktsegment").alias("a2"),
    )
    return a.join(b, "k1").select(
        "k1",
        "k2",
        F.round(jaro_winkler("n1", "n2"), 9).alias("name_sim"),
        F.round(jaro_winkler("a1", "a2"), 9).alias("seg_sim"),
    )
