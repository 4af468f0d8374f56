"""Registry queries: graph family. Split from queries.py
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
    "triangle_counts_parts",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), pairs AS (
      SELECT a.pk AS ea, b.pk AS eb
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ), tri AS (
      SELECT e1.ea AS x, e1.eb AS y, e2.eb AS z
      FROM pairs e1
      JOIN pairs e2 ON e2.ea = e1.eb
      JOIN pairs e3 ON e3.ea = e1.ea AND e3.eb = e2.eb
    )
    SELECT v, CAST(count(*) AS BIGINT) AS triangles
    FROM (
      SELECT x AS v FROM tri
      UNION ALL SELECT y AS v FROM tri
      UNION ALL SELECT z AS v FROM tri
    )
    GROUP BY 1
    """,
)
def q_triangle_counts_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph (parts
    bought together in ≥2 orders) — the clustering-structure signal
    recommender and community pipelines start from. The engine side is
    degree-oriented wedge counting (operators/graph.py:triangle_counts,
    Suri & Vassilvitskii's O(m^1.5) skew-proof orientation); the
    oracle closes triangles by brute three-way join over the same
    canonical a<b edge list — both count each triangle exactly once,
    so per-node counts hash-match."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import (
        triangle_counts,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 2)
        .select("src", "dst")
    )
    return triangle_counts(edges)




@register(
    "clustering_coeff_parts",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), pairs AS (
      SELECT a.pk AS ea, b.pk AS eb
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ), deg AS (
      SELECT v, count(*) AS deg FROM (
        SELECT ea AS v FROM pairs UNION ALL SELECT eb AS v FROM pairs
      ) GROUP BY 1 HAVING count(*) >= 2
    ), tri AS (
      SELECT e1.ea AS x, e1.eb AS y, e2.eb AS z
      FROM pairs e1
      JOIN pairs e2 ON e2.ea = e1.eb
      JOIN pairs e3 ON e3.ea = e1.ea AND e3.eb = e2.eb
    ), tcount AS (
      SELECT v, CAST(count(*) AS BIGINT) AS triangles FROM (
        SELECT x AS v FROM tri
        UNION ALL SELECT y AS v FROM tri
        UNION ALL SELECT z AS v FROM tri
      ) GROUP BY 1
    )
    SELECT d.v, coalesce(t.triangles, 0) AS triangles,
           CAST(d.deg * (d.deg - 1) / 2 AS BIGINT) AS wedges,
           round(CAST(coalesce(t.triangles, 0) AS DOUBLE)
                 / (d.deg * (d.deg - 1) / 2), 6) AS coefficient
    FROM deg d LEFT JOIN tcount t ON t.v = d.v
    """,
)
def q_clustering_coeff_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient over the co-purchase graph
    (operators/graph.py:clustering_coefficients): triangles(v) /
    C(deg v, 2) — the neighborhood-cliqueness signal that separates
    organic communities from hub-and-spoke structure. Exact integer
    (triangles, wedges) pair plus one rounded double ratio; the
    degree-oriented triangle engine keeps it skew-proof."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import (
        clustering_coefficients,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 2)
        .select("src", "dst")
    )
    return clustering_coefficients(edges)




@register("kcore_parts_graph", oracle=_kcore_oracle(k=3, rounds=16))
def q_kcore_parts_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the parts co-purchase graph (parts bought together in
    ≥2 orders): the maximal subgraph where every part keeps ≥3
    co-purchase partners — the densification filter that separates
    genuine product communities from incidental co-occurrence stars.
    Engine side peels iteratively to the fixpoint
    (operators/graph.py:k_core — per-round degree aggregate + two
    left-semi joins over edges only, localCheckpoint-flat lineage);
    the oracle unrolls 16 peel rounds (> the fixture's 11-round depth)
    so both reach the identical fixpoint and per-vertex core degrees
    hash-match."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import k_core
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 2)
        .select("src", "dst")
    )
    core = k_core(edges, k=3)
    return core.select(F.col("v").alias("part_id"), "core_degree")




@register(
    "link_prediction_parts",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), pairs AS (
      SELECT a.pk AS ea, b.pk AS eb
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), und AS (
      SELECT ea AS u, eb AS v FROM pairs UNION ALL SELECT eb, ea FROM pairs
    ), deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY 1
    ), wt AS (
      SELECT u, CAST(round(1000000.0 / ln(d), 0) AS BIGINT) AS w_micro
      FROM deg WHERE d >= 2
    ), wedge AS (
      SELECT a.v AS x, b.v AS y, a.u AS p
      FROM und a JOIN und b ON a.u = b.u AND a.v < b.v
    ), cand AS (
      SELECT x, y, CAST(count(*) AS BIGINT) AS common_nbrs,
             CAST(SUM(w.w_micro) AS BIGINT) AS aa_micro
      FROM wedge JOIN wt w ON wedge.p = w.u
      GROUP BY 1, 2
    ), nonedge AS (
      SELECT c.* FROM cand c
      LEFT JOIN pairs e ON c.x = e.ea AND c.y = e.eb
      WHERE e.ea IS NULL
    )
    SELECT x AS part_a, y AS part_b, common_nbrs, aa_micro,
           round(common_nbrs / CAST(dx.d + dy.d - common_nbrs AS DOUBLE), 6)
             AS jaccard_r6
    FROM nonedge JOIN deg dx ON x = dx.u JOIN deg dy ON y = dy.u
    ORDER BY aa_micro DESC, common_nbrs DESC, part_a, part_b LIMIT 50
    """,
)
def q_link_prediction_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 predicted co-purchase links: the highest Adamic-Adar
    non-edges of the parts graph (same ≥2-orders edge definition as
    `triangle_counts_parts`) — the "customers who bought X also
    bought Y" candidate generator. Fixed-point AA weights make the
    ranking hash-exact across engines (operators/graph.py:
    link_prediction)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.graph import (
        link_prediction,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk"))
        )
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 2)
        .select("src", "dst")
    )
    return link_prediction(edges, k=50)
