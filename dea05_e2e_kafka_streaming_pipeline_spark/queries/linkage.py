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
    bench_tier_max=0.01,  # quadratic exactness anchor (25-nation block): sweeps everywhere, timed only at oracle scale
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




_SNB_SCORE_CASES = """
        CASE WHEN a.c_mktsegment IS NULL OR b.c_mktsegment IS NULL THEN 0
             WHEN a.c_mktsegment = b.c_mktsegment THEN 16 ELSE -4
        END AS pts_segment,
        CASE WHEN a.c_acctbal IS NULL OR b.c_acctbal IS NULL THEN 0
             WHEN abs(a.c_acctbal - b.c_acctbal) <= 100.0 THEN 24 ELSE -8
        END AS pts_balance,
        CASE WHEN a.c_name IS NULL OR b.c_name IS NULL THEN 0
             WHEN right(a.c_name, 2) = right(b.c_name, 2) THEN 8 ELSE -2
        END AS pts_name_suffix
"""

_SNB_PAIRS_CTE = f"""
    ranked AS (
      SELECT c_custkey, c_name, c_mktsegment, c_acctbal, c_nationkey,
             row_number() OVER (
               ORDER BY c_nationkey, c_name, c_custkey
             ) AS rn
      FROM customer
    ), scored AS (
      SELECT a.c_custkey AS left_id, b.c_custkey AS right_id,
        {_SNB_SCORE_CASES}
      FROM ranked a JOIN ranked b
        ON b.rn > a.rn AND b.rn <= a.rn + 10
       AND a.c_nationkey IS NOT DISTINCT FROM b.c_nationkey
    )
"""


def _snb_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared candidate+score pipeline of the two SNB queries."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.linkage import (
        FieldComparison,
        exact,
        sorted_neighborhood_linkage,
        within,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    suffix2 = lambda l, r: F.substring(l, -2, 2) == F.substring(r, -2, 2)  # noqa: E731,E741
    return sorted_neighborhood_linkage(
        load_table(spark, sf_dir, "customer"),
        sort_on=["c_name"],
        partition_on=["c_nationkey"],
        comparisons=[
            FieldComparison("segment", "c_mktsegment", "c_mktsegment", exact, 16, -4),
            FieldComparison("balance", "c_acctbal", "c_acctbal", within(100.0), 24, -8),
            FieldComparison("name_suffix", "c_name", "c_name", suffix2, 8, -2),
        ],
        id_col="c_custkey",
        min_score=30,
        window=10,
    )


@register(
    "linkage_snb_pairs",
    oracle=f"""
    WITH {_SNB_PAIRS_CTE}
    SELECT left_id, right_id, pts_segment, pts_balance, pts_name_suffix,
           pts_segment + pts_balance + pts_name_suffix AS score
    FROM scored
    WHERE pts_segment + pts_balance + pts_name_suffix >= 30
    """,
)
def q_linkage_snb_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage (operators/linkage.py:
    sorted_neighborhood_linkage): one global (nation, name, id) rank
    via the range-shuffle global_row_number scaffold, candidates =
    pairs within 10 rank positions agreeing on nation, then the SAME
    Fellegi-Sunter integer scoring as `linkage_customer_pairs`. This
    is the named scale fix for that query's measured 22.7x wall at 10x
    input (SCALE.md): equality blocking on a FIXED-cardinality key
    (25 nations) fattens every block linearly, so pair volume grows
    n-squared, while SNB emits at most n*window candidates at any n.
    Oracle: identical rank window + band join + CASE arithmetic."""
    return _snb_customer_pairs(spark, sf_dir)


@register(
    "entity_resolution_snb",
    oracle=f"""
    WITH RECURSIVE {_SNB_PAIRS_CTE}, pairs AS (
      SELECT left_id, right_id FROM scored
      WHERE pts_segment + pts_balance + pts_name_suffix >= 30
    ), edges AS (
      SELECT left_id AS u, right_id AS v FROM pairs
      UNION ALL SELECT right_id, left_id FROM pairs
    ), reach(id, label) AS (
      SELECT c_custkey, c_custkey FROM customer
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.id
    ), comp AS (
      SELECT id, min(label) AS entity_id FROM reach GROUP BY id
    ), survived AS (
      SELECT comp.entity_id, c.c_custkey, c.c_name, c.c_acctbal,
             count(*) OVER (PARTITION BY comp.entity_id) AS n_members,
             row_number() OVER (
               PARTITION BY comp.entity_id
               ORDER BY c.c_acctbal DESC, c.c_custkey
             ) AS rk
      FROM customer c JOIN comp ON comp.id = c.c_custkey
    )
    SELECT entity_id, CAST(n_members AS BIGINT) AS n_members,
           c_custkey AS golden_custkey, c_name AS golden_name,
           c_acctbal AS golden_acctbal
    FROM survived WHERE rk = 1 AND n_members > 1
    """,
)
def q_entity_resolution_snb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MDM flow (match -> transitive closure -> survivorship,
    exactly `entity_resolution_customers`) with sorted-neighborhood
    candidate generation replacing nation-block candidates — the
    at-scale composition: linear candidates feed the same closure and
    ranked survivorship, turning the measured 54.3x-at-10x end-to-end
    flow (SCALE.md) into a ~linear one. Oracle: SNB band join + CASE
    scoring + recursive-CTE closure + identical ranked survivorship."""
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    cust = load_table(spark, sf_dir, "customer")
    pairs = _snb_customer_pairs(spark, sf_dir).select(
        F.col("left_id").alias("id_a"), F.col("right_id").alias("id_b")
    )
    comp = connected_components(
        cust.select("c_custkey"), pairs, id_col="c_custkey", algorithm="auto"
    )
    members = cust.join(comp, "c_custkey").withColumnsRenamed(
        {"component_id": "entity_id"}
    )
    w = Window.partitionBy("entity_id")
    ranked = members.withColumn("n_members", F.count(F.lit(1)).over(w)).withColumn(
        "rk",
        F.row_number().over(
            w.orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
        ),
    )
    return ranked.filter((F.col("rk") == 1) & (F.col("n_members") > 1)).select(
        "entity_id",
        F.col("n_members").cast("long").alias("n_members"),
        F.col("c_custkey").alias("golden_custkey"),
        F.col("c_name").alias("golden_name"),
        F.col("c_acctbal").alias("golden_acctbal"),
    )
