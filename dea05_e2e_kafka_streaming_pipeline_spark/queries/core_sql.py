"""Registry queries: core_sql family. Split from queries.py
(r4 verdict item 2); registration order within the family preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.queries._registry import (  # noqa: F401
    register,
)
from dea05_e2e_kafka_streaming_pipeline_spark.queries._shared import *  # noqa: F401,F403




# ---------------------------------------------------------------------------
# Gold-layer queries (reference enriched/*.py)
# ---------------------------------------------------------------------------

@register(
    "daily_sales_by_region",
    oracle=(_DAILY_SALES_ORACLE := f"""
    {_ENTITY_CTES}
    SELECT strftime(o.order_date, '%Y-%m-%d') AS date,
           c.region AS region,
           count(o.order_id) AS total_orders,
           {_SUM_AMOUNT} AS total_revenue,
           {_SUM_AMOUNT} / count(o.order_amount) AS avg_order_value,
           count(o.customer_id) AS unique_customers
    FROM o JOIN c USING (customer_id)
    GROUP BY 1, 2
    """),
)
def q_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference enriched/daily_sales_aggregation.py:14-26."""
    return build_daily_sales(load_orders(spark, sf_dir), load_customers(spark, sf_dir))




@register(
    "referral_tree_rollup",
    oracle=f"""
    {_ENTITY_CTES.replace("WITH ", "WITH RECURSIVE ", 1)},
    closure(ancestor, descendant) AS (
      SELECT customer_id AS ancestor, customer_id AS descendant FROM c
      UNION ALL
      SELECT cl.ancestor, ch.customer_id
      FROM c ch JOIN closure cl
        ON CAST(floor(ch.customer_id / 10) AS BIGINT) = cl.descendant
       AND ch.customer_id >= 10
    )
    SELECT cl.ancestor AS customer_id,
           count(DISTINCT cl.descendant) - 1 AS n_descendants,
           CAST(coalesce(SUM(CAST(o.order_amount AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS subtree_revenue,
           count(o.order_id) AS subtree_orders
    FROM closure cl LEFT JOIN o ON o.customer_id = cl.descendant
    GROUP BY 1
    """,
)
def q_referral_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup via a NATIVE ``WITH RECURSIVE`` CTE (Spark
    4): the ancestor-descendant closure of a synthetic referral forest
    (parent = customer_id/10 — deterministic, strictly decreasing,
    hence acyclic, which is required: Spark's recursive CTEs support
    UNION ALL only), then subtree revenue/order rollups per ancestor.
    Recursion depth is the hierarchy depth (~4 here); each round is
    one join — the same SQL text runs on DuckDB, demonstrating
    engine-level recursive-query parity rather than a hand-built
    iterative loop (which ``connected_components`` provides for
    CYCLIC graphs, where UNION-dedup recursion is unavailable)."""
    load_orders(spark, sf_dir).createOrReplaceTempView("ref_o")
    load_customers(spark, sf_dir).createOrReplaceTempView("ref_c")
    # anchor columns are aliased to DISTINCT names: `SELECT customer_id,
    # customer_id` gives the anchor two copies of ONE attribute, and the
    # recursive executor's per-step materialization (LogicalRDD) warns on
    # the duplicate-output projection every round — the exact warning
    # class that precedes wrong-column bugs after a refactor (r7 verdict
    # item 4). Same SQL text still runs on DuckDB.
    return spark.sql("""
    WITH RECURSIVE closure(ancestor, descendant) AS (
      SELECT customer_id AS ancestor, customer_id AS descendant FROM ref_c
      UNION ALL
      SELECT cl.ancestor, ch.customer_id
      FROM ref_c ch JOIN closure cl
        ON CAST(floor(ch.customer_id / 10) AS BIGINT) = cl.descendant
       AND ch.customer_id >= 10
    )
    SELECT cl.ancestor AS customer_id,
           count(DISTINCT cl.descendant) - 1 AS n_descendants,
           CAST(coalesce(SUM(CAST(o.order_amount AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS subtree_revenue,
           count(o.order_id) AS subtree_orders
    FROM closure cl LEFT JOIN ref_o o ON o.customer_id = cl.descendant
    GROUP BY 1
    """)




@register(
    "events_props_variant",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_k
    FROM events GROUP BY 1
    """,
)
def q_events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through Spark 4's VARIANT type:
    ``parse_json`` once into a variant column, then typed
    ``try_variant_get`` extraction — the open-schema path for payloads
    whose shape drifts (vs ``get_json_object`` string re-parsing per
    field, see `events_props_stats`). At scale VARIANT parses each
    payload once into a binary-encoded form; every later field access
    is a cheap typed probe, and unexpected shapes yield NULL instead
    of failing the pipeline."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.try_variant_get("v", "$.k", "long")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.sum(F.when(k.isNull(), 1).otherwise(0)).alias("n_missing_k"),
    )




@register(
    "daily_sales_distinct",
    oracle=f"""
    {_ENTITY_CTES}
    SELECT strftime(o.order_date, '%Y-%m-%d') AS date,
           c.region AS region,
           count(o.order_id) AS total_orders,
           count(DISTINCT o.customer_id) AS unique_customers_distinct
    FROM o JOIN c USING (customer_id)
    GROUP BY 1, 2
    """,
)
def q_daily_sales_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corrected variant of the reference's `unique_customers`
    count-not-distinct trap (SURVEY §2.4): a real countDistinct."""
    from pyspark.sql import functions as F

    return (
        build_daily_sales(
            load_orders(spark, sf_dir),
            load_customers(spark, sf_dir),
            distinct_customers=True,
        )
        .withColumnRenamed("unique_customers", "unique_customers_distinct")
        .select("date", "region", "total_orders", "unique_customers_distinct")
    )




@register(
    "order_priority_revenue",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           count(DISTINCT o.o_orderkey) AS n_orders,
           count(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q_order_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large join (lineitem ⋈ orders on orderkey) → priority
    rollup. Unlike the dimension joins elsewhere, both sides grow with
    the fact data — at scale Catalyst plans a sort-merge join on the
    shared key (or co-located bucket join if both tables are bucketed
    by orderkey via write_bucketed_table)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(price * (F.lit(1).cast("decimal(4,2)") - disc))
            .cast("double")
            .alias("revenue"),
        )
    )




@register(
    "shipping_priority_topk",
    oracle="""
    SELECT l.l_orderkey AS order_key,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           o.o_orderdate AS order_date,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, order_key ASC
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer dim (broadcast) into
    the orders⋈lineitem fact join, date predicates pushed to both fact
    scans, top-10 by revenue via TakeOrdered — the canonical
    "unshipped-revenue" interactive query."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.sum(price * (F.lit(1).cast("decimal(4,2)") - disc))
            .cast("double")
            .alias("revenue")
        )
        .select("order_key", "revenue", "order_date", "priority")
        .orderBy(F.desc("revenue"), F.asc("order_key"))
        .limit(10)
    )




@register(
    "returned_revenue_customers",
    oracle="""
    SELECT c.c_custkey AS customer_key,
           c.c_name AS customer_name,
           n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, customer_key ASC
    LIMIT 20
    """,
)
def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-lineitem revenue per customer over a
    half-year window — two broadcast dims (customer, nation) onto the
    fact join, return-flag and date filters pushed to the scans, top-20
    via TakeOrdered."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(price * (F.lit(1).cast("decimal(4,2)") - disc))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("customer_key"))
        .limit(20)
    )




@register(
    "repeat_customers_setops",
    oracle="""
    SELECT o_custkey AS customer_id
    FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers active in both 1995 and 1996 but not
    1997 (INTERSECT / EXCEPT — distinct-set semantics)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    o = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return o.filter(F.year("o_orderdate") == y).select(
            F.col("o_custkey").alias("customer_id")
        )

    return year(1995).intersect(year(1996)).exceptAll(year(1997).distinct()).distinct()




@register(
    "big_spender_segments",
    oracle="""
    SELECT c.c_mktsegment AS segment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 10000)
    GROUP BY 1
    """,
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi + left-anti joins: customers
    with at least one >400k order and no <10k order, counted by segment."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    small = o.filter(F.col("o_totalprice") < 10000).select("o_custkey")
    return (
        c.join(big, c["c_custkey"] == big["o_custkey"], "left_semi")
        .join(small, F.col("c_custkey") == small["o_custkey"], "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )




@register(
    "revenue_rollup_year_month",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ROLLUP (1, 2)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the year→month hierarchy (subtotals + grand total)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return (
        load_table(spark, sf_dir, "orders")
        .rollup(
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )




@register("region_gini_inequality", oracle=_GINI_ORACLE)
def q_region_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini inequality of order amounts per region, computed
    through a GROUPED-AGG pandas UDF — the one pandas API surface the
    engine hadn't exercised (scalar/mapInPandas/applyInPandas/cogroup/
    UDTF all have homes). The UDF receives each region's full value
    series as one Arrow batch and folds it with PYTHON-INT arithmetic
    over cents (sorted Σ(2i−n−1)·xᵢ — tie assignment provably cancels),
    so the only float op is one final division of exact integers —
    bit-identical to the oracle's window formulation. Scale note: a
    grouped-agg UDF materializes each group on one executor; this
    query's groups are region-bounded — for unbounded groups use the
    sort-based distributed formulation (global_row_number + one
    aggregate), same formula."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    import pandas as pd

    def _gini(v):
        x = sorted(int(c) for c in v)
        n, s = len(x), sum(x)
        if n == 0 or s == 0:
            return 0.0
        num = sum((2 * i - n - 1) * xi for i, xi in enumerate(x, start=1))
        return round(num / float(n * s), 6)

    # postponed-annotations module: set the signature explicitly so
    # pandas_udf recognizes the GROUPED_AGG (Series -> scalar) shape
    _gini.__annotations__ = {"v": pd.Series, "return": float}
    gini_cents = pandas_udf(_gini, "double")

    j = (
        load_orders(spark, sf_dir)
        .join(
            F.broadcast(load_customers(spark, sf_dir).select("customer_id", "region")),
            "customer_id",
        )
        .select(
            "region",
            (F.col("order_amount").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    return j.groupBy("region").agg(gini_cents("cents").alias("gini"))




@register("region_gini_native", oracle=_GINI_ORACLE, bench=False)
def q_region_gini_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME Gini, fully distributed and UDF-free — the scale
    formulation the grouped-agg UDF's docstring names: per-region rank
    window (partitioned by region, so no single-reducer collapse) +
    one integer aggregate, the only float op the final division.
    Hash-matches the identical oracle as `region_gini_inequality` —
    two independent implementations cross-checking each other
    (bench=False: deliberate duplicate of that query's answer)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    j = (
        load_orders(spark, sf_dir)
        .join(
            F.broadcast(load_customers(spark, sf_dir).select("customer_id", "region")),
            "customer_id",
        )
        .select(
            "region",
            (F.col("order_amount").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    w = Window.partitionBy("region").orderBy("cents")
    ranked = j.select(
        "region",
        "cents",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("region")).alias("n"),
    )
    # each per-row product fits int64 easily (rank ≤ ~3M × cents ≤
    # ~5e7 → ≤ 3e14) but the per-region SUM reaches ~7.6e19 at the
    # x100 tier — past int64. Summing exact DECIMAL(38,0) terms keeps
    # the integer arithmetic exact (the contract: the only float op is
    # the final division), then the one cast to double is the same
    # nearest-double the oracle's INT128 sum takes.
    term = ((2 * F.col("i") - F.col("n") - 1) * F.col("cents")).cast(
        "decimal(38,0)"
    )
    return ranked.groupBy("region").agg(
        F.round(
            F.sum(term).cast("double")
            / (F.max("n").cast("double") * F.sum("cents")),
            6,
        ).alias("gini")
    )




@register(
    "customer_rfm_segments",
    oracle=f"""
    {_ENTITY_CTES}
    , rfm AS (
      SELECT customer_id,
             date_diff('day', max(order_date), DATE '1998-08-02') AS recency_days,
             count(*) AS frequency,
             CAST(SUM(CAST(order_amount AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM o GROUP BY customer_id
    ), seg AS (
      SELECT *,
             CASE WHEN recency_days <= 90 THEN 'active'
                  WHEN recency_days <= 365 THEN 'cooling'
                  ELSE 'lapsed' END AS r_band,
             CASE WHEN frequency >= 20 THEN 'frequent'
                  WHEN frequency >= 10 THEN 'regular'
                  ELSE 'occasional' END AS f_band,
             CASE WHEN monetary >= 3000000 THEN 'high'
                  WHEN monetary >= 1000000 THEN 'mid'
                  ELSE 'low' END AS m_band
      FROM rfm
    )
    SELECT r_band, f_band, m_band,
           count(*) AS n_customers,
           CAST(sum(CAST(monetary * 100 AS BIGINT)) // count(*) AS BIGINT)
             AS avg_monetary_cents
    FROM seg GROUP BY 1, 2, 3
    """,
)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) with FIXED
    deterministic bands (not data-dependent quantiles — those live in
    `customer_spend_quartiles`): per customer, days since last order at
    the dataset's reference date, order count, and exact-decimal
    lifetime value, banded into a 3×3×3 segment grid with per-segment
    counts and cent-exact average monetary value. One grouped aggregate
    over orders + one tiny segment rollup."""
    from pyspark.sql import functions as F

    rfm = (
        load_orders(spark, sf_dir)
        .groupBy("customer_id")
        .agg(
            F.datediff(F.lit("1998-08-02").cast("date"), F.max("order_date")).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("order_amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    seg = rfm.select(
        "*",
        F.when(F.col("recency_days") <= 90, "active")
        .when(F.col("recency_days") <= 365, "cooling")
        .otherwise("lapsed")
        .alias("r_band"),
        F.when(F.col("frequency") >= 20, "frequent")
        .when(F.col("frequency") >= 10, "regular")
        .otherwise("occasional")
        .alias("f_band"),
        F.when(F.col("monetary") >= 3_000_000, "high")
        .when(F.col("monetary") >= 1_000_000, "mid")
        .otherwise("low")
        .alias("m_band"),
    )
    # the mean reports in integer CENTS via floor division — a rounded
    # double mean can land on a .xx5 boundary where Spark's and
    # DuckDB's round() disagree by one cent (observed at sf0.01)
    return seg.groupBy("r_band", "f_band", "m_band").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr(
            "sum(CAST(monetary * 100 AS BIGINT)) div count(*)"
        ).alias("avg_monetary_cents"),
    )




@register(
    "benford_amount_audit",
    oracle=f"""
    WITH o AS (SELECT CAST(order_amount AS DECIMAL(18,2)) AS amt
               FROM ({ORDERS_SQL}) WHERE order_amount > 0),
    d AS (SELECT CAST(substr(CAST(amt AS VARCHAR), 1, 1) AS INT) AS digit
          FROM o),
    c AS (SELECT digit, count(*) AS observed FROM d GROUP BY digit),
    n AS (SELECT count(*) AS total FROM d)
    SELECT c.digit, c.observed,
           round(n.total * log10(1.0 + 1.0 / c.digit), 2) AS expected_benford,
           round(CAST(c.observed AS DOUBLE) / n.total
                 - log10(1.0 + 1.0 / c.digit), 6) AS deviation
    FROM c CROSS JOIN n
    """,
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order amounts — the
    forensic-accounting fraud screen as one aggregate: observed
    leading-digit counts vs the log10(1+1/d) expectation and the
    per-digit deviation. The digit comes from the decimal(18,2) STRING
    form (identical in both engines), not float log arithmetic, so
    bucketing is engine-exact; only the final expectation/deviation are
    (identically-computed) doubles."""
    from pyspark.sql import functions as F

    o = (
        load_orders(spark, sf_dir)
        .filter(F.col("order_amount") > 0)
        .select(F.col("order_amount").cast("decimal(18,2)").alias("amt"))
    )
    d = o.select(
        F.substring(F.col("amt").cast("string"), 1, 1).cast("int").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    n = d.agg(F.count(F.lit(1)).alias("total"))
    expected = F.round(
        F.col("total") * F.log10(1.0 + 1.0 / F.col("digit")), 2
    )
    deviation = F.round(
        F.col("observed").cast("double") / F.col("total")
        - F.log10(1.0 + 1.0 / F.col("digit")),
        6,
    )
    return (
        c.crossJoin(F.broadcast(n))
        .select(
            "digit",
            "observed",
            expected.alias("expected_benford"),
            deviation.alias("deviation"),
        )
    )




@register(
    "basket_part_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), n_orders AS (
      SELECT count(DISTINCT ok) AS n FROM items
    ), supp AS (
      SELECT pk, count(*) AS s FROM items GROUP BY pk
    ), pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS together
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b, p.together,
           sa.s AS n_a, sb.s AS n_b,
           round(CAST(p.together AS DOUBLE) * n.n / (sa.s * sb.s), 6) AS lift
    FROM pairs p
    JOIN supp sa ON sa.pk = p.part_a
    JOIN supp sb ON sb.pk = p.part_b
    CROSS JOIN n_orders n
    WHERE p.together >= 2
    """,
)
def q_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence over order lineitems: part pairs
    bought together ≥ 2 times with supports and lift
    (P(a,b)/(P(a)·P(b)) — the association-rule screen behind
    recommendations). Plan shape: items reduce to DISTINCT
    (order, part) FIRST, the pair self-join runs per order key (pair
    volume bounded by per-basket item count², ~7² here — the same
    bound a retailer's baskets give). The 1-row order total broadcasts;
    the per-part support joins are left to AQE (the part dimension is
    NOT always broadcastable at scale — it shuffles on the same part
    keys the pair aggregate already produced). Lift's integer
    numerator/denominator are exact; one final rounded division keeps
    the hash engine-exact."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n_orders = items.agg(F.countDistinct("ok").alias("n"))
    supp = items.groupBy("pk").agg(F.count(F.lit(1)).alias("s"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 2)
    )
    return (
        pairs.join(
            supp.select(F.col("pk").alias("part_a"), F.col("s").alias("n_a")),
            "part_a",
        )
        .join(
            supp.select(F.col("pk").alias("part_b"), F.col("s").alias("n_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "together",
            "n_a",
            "n_b",
            F.round(
                F.col("together").cast("double") * F.col("n")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )




@register(
    "revenue_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT order_date AS d,
             CAST(SUM(CAST(order_amount AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
      FROM ({ORDERS_SQL}) GROUP BY 1
    ), pairs AS (
      SELECT a.r AS x, b.r AS y
      FROM daily a JOIN daily b ON b.d = a.d + INTERVAL 1 DAY
    ), m AS (
      -- widen the multiplicands: a DECIMAL(18,2) x DECIMAL(18,2)
      -- product overflows duckdb's 18-digit cap once daily totals
      -- pass ~1e10 (seen at the x10 tier); DECIMAL(38,2) keeps the
      -- moments exact at any realistic scale, same values at sf0.01
      SELECT count(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,2)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,2)) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,2)) * y) AS DOUBLE) AS syy
      FROM pairs
    )
    SELECT n,
           round((sxy - sx * sy / CAST(n AS DOUBLE))
                 / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                        * (syy - sy * sy / CAST(n AS DOUBLE))), 6)
             AS lag1_autocorr
    FROM m
    """,
)
def q_revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of DAILY revenue — the time-series
    persistence diagnostic (is today's revenue predictive of
    tomorrow's?) under the exact-moment discipline: daily sums are
    exact decimals, lagged pairs come from a calendar self-join on
    d+1 (only consecutive days pair — no window over gaps), the five
    moment sums are exact decimal aggregates, and the Pearson formula
    evaluates once on the one-row result."""
    from pyspark.sql import functions as F

    daily = (
        load_orders(spark, sf_dir)
        .groupBy(F.col("order_date").alias("d"))
        .agg(
            F.sum(F.col("order_amount").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("r")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b, F.col("b.d") == F.date_add(F.col("a.d"), 1)
    ).select(F.col("a.r").alias("x"), F.col("b.r").alias("y"))
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        "n",
        F.round(
            (F.col("sxy") - F.col("sx") * F.col("sy") / nd)
            / F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / nd)
                * (F.col("syy") - F.col("sy") * F.col("sy") / nd)
            ),
            6,
        ).alias("lag1_autocorr"),
    )




@register(
    "events_props_stats",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           CAST(sum(k) AS BIGINT) AS k_sum,
           round(CAST(sum(k) AS DOUBLE) / count(*), 6) AS k_avg,
           min(k) AS k_min, max(k) AS k_max
    FROM (
      SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events
    )
    GROUP BY event_type
    """,
)
def q_events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of the JSON
    ``props`` payload (the Kafka-message shape the reference ingests,
    ingestion/s3-orders-ingestion.py:31-40) and aggregate it per event
    type — ``get_json_object`` is a native Catalyst expression, so the
    parse runs codegen inside the scan stage with no Python involved;
    the integer sum is exact, the mean is one final double division."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.round(
                F.sum("k").cast("double") / F.count(F.lit(1)), 6
            ).alias("k_avg"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )




@register(
    "latest_order_per_customer",
    oracle=f"""
    {_ENTITY_CTES},
    r AS (
      SELECT order_id, order_date, order_amount, customer_id,
             row_number() OVER (PARTITION BY customer_id
                                ORDER BY order_date DESC, order_id DESC) AS rn
      FROM o
    )
    SELECT order_id, order_date, order_amount, customer_id
    FROM r WHERE rn = 1
    """,
)
def q_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-order-per-customer dedup — the per-key ordering the
    reference's unused Window/row_number imports intended
    (enriched/custome_lifetime_value.py:1-2, SURVEY §2.5)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("customer_id").orderBy(
        F.desc("order_date"), F.desc("order_id")
    )
    return (
        load_orders(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("order_id", "order_date", "order_amount", "customer_id")
    )




@register(
    "events_value_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS median_value,
           round(quantile_cont(value, 0.9), 6) AS p90_value,
           round(quantile_cont(value, 0.99), 6) AS p99_value,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_event_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (Spark
    ``percentile`` == DuckDB ``quantile_cont``); the approximate
    variant for the 100 TB path is ``percentile_approx`` behind the
    same shape."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )




@register(
    "events_hourly_stats",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window stats by event type — the engine's
    watermarked streaming aggregation, oracle-checked on batch input."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        windowed_event_stats,
    )

    events = load_table(spark, sf_dir, "events")
    return windowed_event_stats(events, group_extra=["event_type"])




@register("bpe_merges_docs", oracle=_bpe_oracle(8))
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary training (8 merges) on the corpus word-frequency
    table: one full-data pass builds the vocab, every round is a
    weighted pair aggregate over vocab rows + a 1-row argmax fetch —
    the data never re-scans. Oracle replays the identical loop in
    DuckDB round by round."""
    merges, _ = _bpe_state(sf_dir)
    return merges




@register(
    "doc_provenance",
    oracle="""
    SELECT doc_id,
           regexp_extract(filename, '[^/]+$') AS file_name,
           CAST(file_row_number AS BIGINT) AS row_index
    FROM read_parquet('/root/testdata/sf0.01/documents.parquet',
                      filename=true, file_row_number=true)
    """,
)
def q_doc_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level provenance from the scan's hidden ``_metadata`` struct
    — (source file, row index) per document with ZERO extra I/O: the
    scan itself populates the columns, so lineage tracking at 100 TB
    costs a projection, not a join against a manifest. Oracle: DuckDB's
    filename/file_row_number over the same file (driver-contract sf0.01
    path; the Spark side derives from sf_dir)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.schemas import DOCUMENTS_SCHEMA

    # explicit schema: no footer-inference job at plan-build time
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(
        f"{sf_dir}/documents.parquet"
    ).select(
        "doc_id",
        F.regexp_extract(F.col("_metadata.file_path"), "[^/]+$", 0).alias(
            "file_name"
        ),
        F.col("_metadata.row_index").alias("row_index"),
    )




@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), totals AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
      FROM pairs GROUP BY 1
    )
    SELECT p.from_type, p.to_type, p.n,
           round(CAST(p.n AS DOUBLE) / t.row_total, 6) AS p_transition
    FROM pairs p JOIN totals t USING (from_type)
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event streams:
    consecutive event-type bigrams per user (total order: ts, event_id)
    with counts and per-row transition probabilities — the sequence
    model behind journey prediction and anomaly scoring. One lead()
    window sharing the user exchange, one aggregate over
    |types|² ≤ tiny groups; the probability is the only float (one
    rounded division of exact integers)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_total"), 6).alias(
                "p_transition"
            ),
        )
    )




@register(
    "sales_cube",
    oracle=f"""
    {_ENTITY_CTES}
    SELECT c.region AS region,
           strftime(o.order_date, '%Y') AS order_year,
           count(*) AS n_orders,
           {_SUM_AMOUNT} AS revenue
    FROM o JOIN c USING (customer_id)
    GROUP BY CUBE (1, 2)
    """,
)
def q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-set aggregation (region × year with all margins)."""
    from pyspark.sql import functions as F

    joined = load_orders(spark, sf_dir).join(
        F.broadcast(load_customers(spark, sf_dir)), "customer_id"
    )
    return (
        joined.cube(
            F.col("region"),
            F.date_format("order_date", "yyyy").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("order_amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )




@register(
    "sales_pivot_status",
    oracle="""
    SELECT o_custkey AS customer_id,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS open_total,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS fulfilled_total,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS partial_total
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_sales_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into revenue columns per customer."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .withColumnRenamed("O", "open_total")
        .withColumnRenamed("F", "fulfilled_total")
        .withColumnRenamed("P", "partial_total")
    )




@register(
    "customer_lifetime_value",
    oracle=f"""
    {_ENTITY_CTES},
    m AS (
      SELECT o.customer_id,
             count(o.order_id) AS total_orders,
             {_SUM_AMOUNT} AS lifetime_value,
             {_SUM_AMOUNT} / count(o.order_amount) AS avg_order_value,
             min(o.order_date) AS first_order_date,
             max(o.order_date) AS last_order_date
      FROM o GROUP BY o.customer_id
    )
    SELECT m.customer_id, c.name, c.email, c.region,
           m.total_orders, m.lifetime_value, m.avg_order_value,
           c.customer_tenure_days,
           CAST(date_diff('day', m.first_order_date, m.last_order_date) AS INT)
             / m.total_orders AS avg_days_between_orders,
           m.first_order_date, m.last_order_date
    FROM m JOIN c USING (customer_id)
    """,
)
def q_clv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference enriched/custome_lifetime_value.py:18-53."""
    return build_clv(load_orders(spark, sf_dir), load_customers(spark, sf_dir))




@register("approx_user_reach", audited_by=("approx_reach_violations",))
def q_approx_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HyperLogLog++ user reach — the mergeable sketch
    that replaces count(DISTINCT) at 100 TB. The sketch estimate is
    engine-specific by construction (DuckDB's approx_count_distinct is
    a different HLL), so this row is rows-only; the hash-checked
    ``approx_reach_violations`` companion pins the estimate to within
    5% of the exact count inside Spark itself."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )




@register(
    "customer_spend_quartiles",
    oracle=f"""
    {_ENTITY_CTES},
    lv AS (
      SELECT customer_id,
             CAST(SUM(CAST(order_amount AS DECIMAL(18,2))) AS DOUBLE)
               AS lifetime_value
      FROM o GROUP BY customer_id
    )
    SELECT customer_id, lifetime_value,
           ntile(4) OVER (ORDER BY lifetime_value DESC, customer_id)
             AS spend_quartile
    FROM lv
    """,
)
def q_customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segmentation into spend quartiles — equal-frequency
    bucketing over exact decimal lifetime value with a total tiebreak
    order, computed as SQL-standard ntile ARITHMETIC over the
    range-shuffled global rank (plans/analytics.py:global_row_number)
    instead of an unpartitioned ``ntile()`` window: this was the one
    WindowExec single-partition site over a table that GROWS with the
    corpus (per-customer grain — billions at 100 TB), round-5 verdict
    item 8. The bucket formula reproduces the standard remainder
    distribution exactly (first ``n mod 4`` buckets get one extra row),
    so the DuckDB ``ntile(4)`` oracle hash-matches at every tier and
    cardinality, divisible by 4 or not."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        global_row_number,
    )

    lv = (
        load_orders(spark, sf_dir)
        .groupBy("customer_id")
        .agg(
            F.sum(F.col("order_amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("lifetime_value")
        )
    )
    ranked = global_row_number(
        lv.withColumn("__neg_lv", -F.col("lifetime_value")),
        ["__neg_lv", "customer_id"],
        out_col="__rn",
    ).crossJoin(
        F.broadcast(lv.agg(F.count(F.lit(1)).alias("__n")))
    )
    base = F.col("__n") / 4  # integer division below; __n, rn are longs
    base_i = F.floor(base).cast("long")
    rem = F.col("__n") % 4
    cut = rem * (base_i + 1)  # rows covered by the fat (base+1) buckets
    quartile = F.when(
        F.col("__rn") <= cut,
        F.floor((F.col("__rn") - 1) / (base_i + 1)) + 1,
    ).otherwise(
        rem + F.floor((F.col("__rn") - cut - 1) / base_i) + 1
    )
    return ranked.select(
        "customer_id",
        "lifetime_value",
        quartile.cast("int").alias("spend_quartile"),
    )




@register(
    "events_sliding_stats",
    oracle="""
    WITH w AS (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS window_start,
             value
      FROM events
    )
    SELECT window_start, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM w GROUP BY 1
    """,
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h window stats — each event lands in two overlapping
    hour-aligned windows (the oracle enumerates both starts explicitly);
    the streaming face is the same watermarked aggregate."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table
    from dea05_e2e_kafka_streaming_pipeline_spark.streaming.pipeline import (
        windowed_event_stats,
    )

    events = load_table(spark, sf_dir, "events")
    return windowed_event_stats(
        events, window_duration="2 hours", slide_duration="1 hour"
    )




@register(
    "sales_grouping_sets",
    oracle=f"""
    {_ENTITY_CTES}
    SELECT c.region AS region,
           strftime(o.order_date, '%Y') AS order_year,
           count(*) AS n_orders,
           {_SUM_AMOUNT} AS revenue
    FROM o JOIN c USING (customer_id)
    GROUP BY GROUPING SETS ((1), (2), (1, 2))
    """,
)
def q_sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — (region), (year), (region, year)
    without the CUBE's grand-total margin: the explicit grouping-set
    API completing the cube/rollup/pivot/unpivot reshape family. One
    expand + one hash aggregate, same as cube."""
    from pyspark.sql import functions as F

    joined = load_orders(spark, sf_dir).join(
        F.broadcast(load_customers(spark, sf_dir)), "customer_id"
    )
    # grouping columns must be plain attributes for groupingSets to
    # surface them in the output (a computed alias groups correctly but
    # emits NULL) — pre-project the derived year
    pre = joined.select(
        "region",
        F.date_format("order_date", "yyyy").alias("order_year"),
        "order_amount",
    )
    region, year = F.col("region"), F.col("order_year")
    return pre.groupingSets(
        [[region], [year], [region, year]], region, year
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("order_amount").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )




@register(
    "small_quantity_revenue",
    oracle="""
    WITH a AS (
      SELECT l_quantity, l_extendedprice,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                    OVER (PARTITION BY l_partkey) AS DOUBLE)
             / count(*) OVER (PARTITION BY l_partkey) AS avg_q
      FROM lineitem
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM a WHERE l_quantity < CAST(0.2 AS DOUBLE) * avg_q
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated aggregate: revenue from lineitems
    below 20% of their part's average quantity — the correlated scalar
    subquery expressed as a partition window (one shuffle on part key,
    no self-join re-scan)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    avg_q = (
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li.withColumn("__avg", avg_q)
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("__avg"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )




@register(
    "large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
           o.o_orderkey AS order_id, o.o_orderdate AS order_date,
           o.o_totalprice AS order_total, b.sum_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped HAVING + semi-enrichment: orders whose total
    lineitem quantity exceeds 250, joined back to customer — the
    group-filter-then-enrich shape (aggregate prunes before any join)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey", F.col("__q").cast("double").alias("sum_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("order_total"),
            "sum_qty",
        )
    )




@register(
    "idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation_name,
           count(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_balance
    FROM customer c CROSS JOIN avg_bal
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
    GROUP BY 1
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped opportunity screen: LAPSED customers —
    above-average positive balance and no orders since mid-2000 —
    rolled up by nation. Global scalar subquery (one-row aggregate
    broadcast back) + date-filtered anti-join + broadcast dim."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__a")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__a"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_balance"),
        )
    )




@register(
    "order_amount_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.50) AS p50,
           quantile_disc(o_totalprice, 0.75) AS p75,
           quantile_disc(o_totalprice, 0.95) AS p95
    FROM orders
    GROUP BY 1
    """,
)
def q_order_amount_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles per group (ANSI percentile_disc
    WITHIN GROUP — the smallest value whose cume_dist ≥ p): the
    ground-truth companion to the mergeable quantile sketch
    (`quantile_sketch_violations` bounds the sketch against exactly
    this). Discrete (not interpolated) on purpose: the result is an
    actual data element, so no interpolation arithmetic can diverge
    between engines and the hash is exact. Scale shape: Spark's
    percentile_disc is a sort-based aggregate within each group —
    one shuffle on the group key, no global sort."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return load_table(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.95)
        ]
    )




@register(
    "funnel_conversion_times",
    oracle="""
    WITH c AS (
      SELECT user_id, min(ts) AS first_click
      FROM events WHERE event_type = 'click' GROUP BY 1
    ), conv AS (
      SELECT e.user_id, c.first_click, min(e.ts) AS conv_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.first_click
      GROUP BY 1, 2
    ), deltas AS (
      -- floor each epoch BEFORE differencing: Spark's unix_timestamp
      -- truncates sub-second timestamps to whole seconds, while
      -- DuckDB's epoch() keeps the fraction (and CAST rounds)
      SELECT CAST(floor(epoch(conv_ts)) - floor(epoch(first_click)) AS BIGINT) AS sec
      FROM conv
    )
    SELECT count(*) AS n_converted,
           quantile_disc(sec, 0.25) AS p25_sec,
           quantile_disc(sec, 0.50) AS p50_sec,
           quantile_disc(sec, 0.75) AS p75_sec
    FROM deltas
    """,
)
def q_funnel_conversion_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, first click → first
    subsequent purchase, summarized as exact discrete percentiles of
    the conversion delay — the funnel-latency report product teams run
    beside the conversion-rate funnel (`event_funnel_users`). Two
    map-side-combinable aggregates + one user-keyed join; the final
    percentile_disc runs over |converted users| rows (one sort-based
    aggregate, no window)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id", "first_click")
        .agg(F.min("ts").alias("conv_ts"))
    )
    deltas = conv.select(
        (F.unix_timestamp("conv_ts") - F.unix_timestamp("first_click"))
        .cast("long")
        .alias("sec")
    )
    return deltas.agg(
        F.count(F.lit(1)).alias("n_converted"),
        *[
            # percentile_disc returns DOUBLE even over longs; the
            # selected element is an exact integer second count, so
            # surface it as BIGINT like the oracle
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY sec)")
            .cast("long")
            .alias(f"p{int(p * 100)}_sec")
            for p in (0.25, 0.50, 0.75)
        ],
    )




@register(
    "revenue_ewma_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ), w AS (
      SELECT d, rev,
             list(CAST(rev AS DECIMAL(18,6))) OVER (
               ORDER BY d ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS win
      FROM daily
    )
    SELECT d AS day, CAST(rev AS DOUBLE) AS revenue,
           CAST(round(CAST(list_sum(list_transform(win, (x, i) ->
             CAST(CAST(x AS DECIMAL(22,6))
                  * ({_EWMA_W_SQL})[len(win) - i + 1] AS DECIMAL(32,15))))
             AS DECIMAL(32,15)), 6) * 1000000 AS BIGINT) AS ewma_micro
    FROM w
    ORDER BY day
    """,
)
def q_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted daily-revenue smoothing with a truncated
    dyadic kernel (α=1/2 over the trailing 9 days): weights are EXACT
    decimal literals (2^-1 … 2^-9), products/sums accumulate in
    decimal — no float recursion, no division — so the smoothed series
    is bit-identical across engines and partitionings (the same
    fixed-point discipline as PageRank). One shuffle for the daily
    aggregate; the kernel is a window-frame collect + weighted fold,
    cost O(9) per day. The global date-ordered frame runs over the
    |days| post-aggregate series (bounded, the documented exception)."""
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    frame = Window.orderBy("day").rowsBetween(-8, Window.currentRow)
    win = F.collect_list(F.col("rev").cast("decimal(18,6)")).over(frame)
    wlit = F.array(
        *[F.lit(f"{w:.9f}").cast("decimal(10,9)") for w in _EWMA_W]
    )
    staged = daily.select(
        "day", F.col("rev").cast("double").alias("revenue"), win.alias("win")
    )
    # newest element is last in the frame list: distance from current
    # for 0-based position i is size-1-i -> weight index size-i (1-based)
    weighted = F.transform(
        "win",
        lambda x, i: (x * F.element_at(wlit, F.size("win") - i)).cast(
            "decimal(32,15)"
        ),
    )
    ewma = F.aggregate(
        weighted,
        F.lit(0).cast("decimal(32,15)"),
        lambda acc, x: (acc + x).cast("decimal(32,15)"),
    )
    # exact integer micro-units: a decimal->double cast differs in the
    # last ulp between engines, so the hash-checked surface is the
    # 6-digit-rounded decimal scaled to BIGINT (exact in both)
    return staged.select(
        "day",
        "revenue",
        (F.round(ewma, 6) * F.lit(1_000_000)).cast("long").alias("ewma_micro"),
    ).orderBy("day")




@register(
    "customer_churn_monthly",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT o_custkey AS c,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS m
      FROM orders
    ), months AS (
      SELECT DISTINCT m FROM activity
    ), churn AS (
      SELECT a.m AS month,
             count(*) FILTER (WHERE b.c IS NULL) AS churned,
             count(*) AS active
      FROM activity a
      LEFT JOIN activity b
        ON b.c = a.c AND b.m = a.m + INTERVAL 1 MONTH
      WHERE a.m + INTERVAL 1 MONTH IN (SELECT m FROM months)
      GROUP BY 1
    )
    SELECT CAST(month AS DATE) AS month,
           CAST(active AS BIGINT) AS active,
           CAST(churned AS BIGINT) AS churned
    FROM churn
    """,
)
def q_customer_churn_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month churn: customers active in month m with no
    order in m+1 (final data month excluded — churn there is
    unobservable). One DISTINCT (customer, month) reduction first, so
    the self-join runs over |customers|x|months| activity rows, never
    order rows; the month+1 lookup is a left join + null test counted
    in the same aggregate. The standard retention complement to
    `cohort_retention_weekly`."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    act = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c"),
            F.date_trunc("month", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("m"),
        )
        .distinct()
    )
    months = act.select("m").distinct()
    nxt = act.select(
        F.col("c").alias("nc"), F.add_months(F.col("m"), -1).alias("pm")
    )
    joined = (
        act.join(
            months.select(F.add_months(F.col("m"), -1).alias("m")).distinct(),
            "m",
            "leftsemi",
        )
        .join(nxt, (F.col("c") == F.col("nc")) & (F.col("m") == F.col("pm")), "left")
        .groupBy(F.col("m").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("active"),
            F.sum(F.when(F.col("nc").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("churned"),
        )
    )
    return joined.select("month", "active", "churned")




@register(
    "order_amount_mad",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority,
             quantile_disc(o_totalprice, 0.5) AS p50
      FROM orders GROUP BY 1
    ), dev AS (
      SELECT o.o_orderpriority, abs(o.o_totalprice - m.p50) AS adev
      FROM orders o JOIN med m USING (o_orderpriority)
    )
    SELECT o_orderpriority,
           (SELECT p50 FROM med WHERE med.o_orderpriority = dev.o_orderpriority)
             AS median_amount,
           quantile_disc(adev, 0.5) AS mad
    FROM dev GROUP BY 1
    """,
)
def q_order_amount_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per order priority — the robust
    dispersion measure (outlier-immune, unlike stddev) as two exact
    discrete-median passes: group medians (percentile_disc, a real
    data element — no interpolation arithmetic to diverge), absolute
    deviations from the group median (one broadcast join of the 5-row
    median table), then the median of those deviations. Every selected
    value is an element of the data, so hashes are exact by
    construction."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "median_amount"
        )
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").withColumn(
        "adev", F.abs(F.col("o_totalprice") - F.col("median_amount"))
    )
    return dev.groupBy("o_orderpriority", "median_amount").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )




@register(
    "basket_rules_confidence",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), supp AS (
      SELECT pk, count(*) AS s FROM items GROUP BY pk
    ), pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS together
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT antecedent, consequent, together, n_ante,
           round(CAST(together AS DOUBLE) / n_ante, 6) AS confidence
    FROM (
      SELECT p.part_a AS antecedent, p.part_b AS consequent,
             p.together, sa.s AS n_ante
      FROM pairs p JOIN supp sa ON sa.pk = p.part_a
      UNION ALL
      SELECT p.part_b, p.part_a, p.together, sb.s
      FROM pairs p JOIN supp sb ON sb.pk = p.part_b
    )
    WHERE round(CAST(together AS DOUBLE) / n_ante, 6) >= 0.1
    """,
)
def q_basket_rules_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules a→b with confidence = P(b|a) =
    together/|a| ≥ 0.1 — the actionable recommendation form on top of
    `basket_part_pairs`' symmetric lift screen (each undirected pair
    yields both directions; confidence is asymmetric, which is the
    point). Exact integer numerator/denominator, one rounded division
    for the hash surface."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    supp = items.groupBy("pk").agg(F.count(F.lit(1)).alias("s"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 2)
    )
    directed = pairs.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "together",
    ).unionAll(
        pairs.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "together",
        )
    )
    out = directed.join(
        supp.select(F.col("pk").alias("antecedent"), F.col("s").alias("n_ante")),
        "antecedent",
    ).withColumn(
        "confidence",
        F.round(F.col("together").cast("double") / F.col("n_ante"), 6),
    )
    return out.filter(F.col("confidence") >= 0.1).select(
        "antecedent", "consequent", "together", "n_ante", "confidence"
    )




@register(
    "cusum_changepoint_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ), c AS (
      SELECT day, CAST(rev AS DOUBLE) AS revenue,
             CAST(SUM(CAST(rev * 100 AS BIGINT)) OVER (ORDER BY day)
                  AS BIGINT) AS p,
             ROW_NUMBER() OVER (ORDER BY day) AS i,
             CAST(SUM(CAST(rev * 100 AS BIGINT)) OVER () AS BIGINT) AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ), s AS (
      SELECT day, revenue, CAST(n * p - i * t AS BIGINT) AS cusum_cents
      FROM c
    )
    SELECT day, revenue, cusum_cents,
           CAST(abs(cusum_cents) = max(abs(cusum_cents)) OVER () AS INT)
             AS is_peak
    FROM s
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily-revenue series — the
    level-shift screen behind pipeline regression alerts. The classic
    statistic S_i = P_i − i·mean needs a division; scaling by n keeps it
    in EXACT integer cents: S'_i = n·P_i − i·T (P_i prefix sum, T grand
    total, both bigint cents), so the hash surface is bit-identical in
    any engine and the peak day (max |S'|) is the argmax changepoint.
    One shuffle for the daily aggregate; the cumulative window runs over
    the |days| post-aggregate series (bounded, the documented
    exception); n/T/max arrive via broadcast one-row joins."""
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
        .withColumn("rc", (F.col("rev") * 100).cast("long"))
    )
    # n / T / the peak all ride GLOBAL windows over the bounded daily
    # series (the oracle's own shape) instead of separate aggregate +
    # broadcast-join passes: the old plan re-derived the daily aggregate
    # (and its orders scan) three times — once per scalar — where every
    # scalar is computable in the single already-sorted window pass.
    seq = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        daily.withColumn("p", F.sum("rc").over(seq))
        .withColumn("i", F.row_number().over(Window.orderBy("day")))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("t", F.sum("rc").over(wall))
        .select(
            "day",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("n") * F.col("p") - F.col("i") * F.col("t"))
            .cast("long")
            .alias("cusum_cents"),
        )
    )
    return staged.select(
        "day",
        "revenue",
        "cusum_cents",
        (F.abs("cusum_cents") == F.max(F.abs("cusum_cents")).over(wall))
        .cast("int")
        .alias("is_peak"),
    )




@register(
    "winsorized_order_stats",
    oracle="""
    WITH amt AS (
      SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS amt
      FROM orders
    ), pct AS (
      SELECT o_orderpriority,
             percentile_disc(0.05) WITHIN GROUP (ORDER BY amt) AS p05,
             percentile_disc(0.95) WITHIN GROUP (ORDER BY amt) AS p95
      FROM amt GROUP BY 1
    )
    SELECT a.o_orderpriority,
           count(*) AS n_orders,
           CAST(p.p05 AS DOUBLE) AS p05,
           CAST(p.p95 AS DOUBLE) AS p95,
           CAST(SUM(greatest(least(a.amt, p.p95), p.p05)) AS DOUBLE)
             AS w_sum,
           round(CAST(SUM(greatest(least(a.amt, p.p95), p.p05)) AS DOUBLE)
                 / count(*), 6) AS w_mean
    FROM amt a JOIN pct p USING (o_orderpriority)
    GROUP BY 1, 3, 4
    """,
)
def q_winsorized_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per order priority: clip amounts at
    the EXACT 5th/95th percentile_disc values (actual data points, so
    the clip bounds hash identically across engines — the same parity
    trick as `order_amount_mad`), then an exact decimal sum of the
    clipped column. Outlier-robust means without MAD's double pass over
    deviations. Two shuffles on the same key (percentile agg, clipped
    agg) with the 5-row percentile table broadcast back — at 100 TB the
    second shuffle partial-aggregates map-side."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    from pyspark.sql import Window

    amt = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("amt"),
    )
    # exact percentile_disc as integer rank arithmetic instead of the
    # ObjectHashAggregate percentile_disc aggregate (which buffers every
    # group value in deserialized object form — measured 1.2-1.4 s vs
    # 0.5 s for the whole-stage-codegen rank plan on the same input).
    # SQL-standard semantics, integer-exact: percentile_disc(p) = min v
    # with cume_dist(v) ≥ p — no p·n double multiply, so the ceil
    # boundary (n divisible by 20) cannot drift from either engine
    # (probed: Spark and DuckDB agree with this formula at n=20/40/100
    # exactly). The rank runs at DISTINCT-VALUE grain (r9, guide §2.5):
    # aggregate to (priority, amt, count) first — map-side combinable —
    # then a cumulative count over the distinct values. cume_dist(v) =
    # cum/n ≥ p ⟺ 100·cum ≥ p100·n, and the boundary value is the
    # first distinct v whose cumulative count crosses (the previous
    # value's cum = cum − c is strictly below). The per-priority sort
    # task then sees |distinct amounts| rows — bounded by the price
    # range at the decimal(·,2) grain (~6e7 values), NOT by row count —
    # where the old row_number window single-task-sorted the whole
    # priority's raw rows (5 partitions = 5 full-table sorts at 100 TB).
    # All rank arithmetic is on longs (sum of counts), so nothing wraps
    # at any scale (the old IntegerType rk·100 wrapped past 21.4M rows
    # per group).
    vals = amt.groupBy("o_orderpriority", "amt").agg(
        F.count(F.lit(1)).alias("c")
    )
    cum_w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("amt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_w = Window.partitionBy("o_orderpriority")
    ranked = vals.withColumn("cum", F.sum("c").over(cum_w)).withColumn(
        "n", F.sum("c").over(n_w)
    )
    cum100 = F.col("cum") * 100
    prev100 = (F.col("cum") - F.col("c")) * 100
    at05 = (cum100 >= F.col("n") * 5) & (prev100 < F.col("n") * 5)
    at95 = (cum100 >= F.col("n") * 95) & (prev100 < F.col("n") * 95)
    pct = (
        ranked.filter(at05 | at95)
        .groupBy("o_orderpriority")
        .agg(
            F.min(F.when(at05, F.col("amt"))).alias("p05"),
            F.min(F.when(at95, F.col("amt"))).alias("p95"),
        )
    )
    # the clip bounds are cast to DOUBLE before clipping — NOT kept
    # decimal — because the hash contract is a FLOAT sum on both sides:
    # DuckDB's percentile_disc returns DOUBLE (greatest/least promote
    # the decimal amounts), and Spark's percentile_disc did too, so the
    # committed w_sum bits are a double accumulation; an exact decimal
    # sum here would drift from the oracle in the last ulps. The scan
    # order (and so the partial-sum schedule) is unchanged by the
    # percentile rewrite above — the amt side is the same plan.
    pd05, pd95 = F.col("p05").cast("double"), F.col("p95").cast("double")
    clipped = amt.join(F.broadcast(pct), "o_orderpriority").withColumn(
        "w", F.greatest(F.least(F.col("amt").cast("double"), pd95), pd05)
    )
    return (
        clipped.groupBy("o_orderpriority", "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("w").alias("w_sum"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.col("p05").cast("double").alias("p05"),
            F.col("p95").cast("double").alias("p95"),
            "w_sum",
            F.round(F.col("w_sum") / F.col("n_orders"), 6).alias("w_mean"),
        )
    )




@register(
    "chisq_region_priority",
    oracle="""
    WITH obs AS (
      SELECT c.c_mktsegment AS region, o.o_orderpriority AS priority,
             count(*) AS observed
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT region, priority, observed,
             CAST(SUM(observed) OVER (PARTITION BY region) AS BIGINT) AS rt,
             CAST(SUM(observed) OVER (PARTITION BY priority) AS BIGINT) AS ct,
             CAST(SUM(observed) OVER () AS BIGINT) AS gt
      FROM obs
    )
    SELECT region, priority, observed,
           round(CAST(rt * ct AS DOUBLE) / gt, 6) AS expected_r6,
           round((observed - CAST(rt * ct AS DOUBLE) / gt)
                 * (observed - CAST(rt * ct AS DOUBLE) / gt)
                 / (CAST(rt * ct AS DOUBLE) / gt), 6) AS chi2_r6
    FROM tot
    """,
)
def q_chisq_region_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer market segment
    and order priority — the categorical-drift / A-B sanity screen as a
    per-cell contribution table (the statistic is the sum; per-cell
    contributions keep the hash surface free of cross-cell float
    summation order). Expected count = row_total·col_total/grand_total:
    integer products, ONE double division — a fixed IEEE expression
    tree, identical in both engines. One broadcast join + one shuffle to
    the 25-cell contingency table; marginals are windows over the
    bounded post-aggregate cells."""
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("region"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    tot = (
        obs.withColumn(
            "rt", F.sum("observed").over(Window.partitionBy("region"))
        )
        .withColumn("ct", F.sum("observed").over(Window.partitionBy("priority")))
        .withColumn("gt", F.sum("observed").over(Window.partitionBy()))
    )
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("gt")
    return tot.select(
        "region",
        "priority",
        "observed",
        F.round(e, 6).alias("expected_r6"),
        F.round((F.col("observed") - e) * (F.col("observed") - e) / e, 6).alias(
            "chi2_r6"
        ),
    )




@register(
    "attribution_first_last",
    oracle="""
    WITH j AS (
      SELECT user_id, ts, event_id, event_type,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS ft,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lt
      FROM events
    )
    SELECT coalesce(ft, '(direct)') AS first_touch,
           coalesce(lt, '(direct)') AS last_touch,
           count(*) AS n_conversions,
           count(DISTINCT user_id) AS n_users
    FROM j WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def q_attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch marketing attribution: each purchase is
    credited to the user's earliest and latest non-purchase touchpoint
    strictly before it (window frame ending at 1 PRECEDING, ordered by
    (ts, event_id) for total determinism), '(direct)' when none exists.
    One shuffle on user_id serves both window passes; the grain of the
    output is the (first, last) channel pair — the standard attribution
    comparison matrix. At 100 TB user partitions are small and the
    frame is a running first/last, O(1) per row."""
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("ft", F.first(touch, ignorenulls=True).over(w))
        .withColumn("lt", F.last(touch, ignorenulls=True).over(w))
    )
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("ft", F.lit("(direct)")).alias("first_touch"),
            F.coalesce("lt", F.lit("(direct)")).alias("last_touch"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )




@register(
    "target_encoding_priority",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS order_id, o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS amt
      FROM orders
    ), s AS (
      SELECT o_orderpriority, SUM(amt) AS tot, count(*) AS n
      FROM a GROUP BY 1
    )
    SELECT order_id, a.o_orderpriority,
           CAST(a.amt AS DOUBLE) AS amount,
           round(CAST(s.tot - a.amt AS DOUBLE) / (s.n - 1), 6) AS te_loo_r6
    FROM a JOIN s USING (o_orderpriority)
    """,
)
def q_target_encoding_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    amount — the feature-engineering staple that replaces a categorical
    with its target mean while excluding the row's own label (the
    anti-leakage form): te_i = (Σ_group − amt_i)/(n_group − 1). The
    numerator is an exact decimal difference, the denominator an exact
    count, one IEEE division per row — engine-exact. Plan: one grouped
    aggregate to the 5-row stats table, broadcast back onto the fact
    rows; no window over the full table, so group size never bounds a
    partition."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    a = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("amt"),
    )
    s = a.groupBy("o_orderpriority").agg(
        F.sum("amt").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    return a.join(F.broadcast(s), "o_orderpriority").select(
        "order_id",
        "o_orderpriority",
        F.col("amt").cast("double").alias("amount"),
        F.round(
            (F.col("tot") - F.col("amt")).cast("double") / (F.col("n") - 1), 6
        ).alias("te_loo_r6"),
    )




@register(
    "dow_seasonality_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ), d AS (
      SELECT isodow(day) AS dow, count(*) AS n_days, SUM(rev) AS rev
      FROM daily GROUP BY 1
    ), t AS (
      SELECT SUM(rev) AS tot, CAST(SUM(n_days) AS BIGINT) AS nd FROM d
    )
    SELECT CAST(dow AS INT) AS dow, n_days,
           CAST(d.rev AS DOUBLE) AS revenue,
           round((CAST(d.rev AS DOUBLE) / n_days)
                 / (CAST(t.tot AS DOUBLE) / t.nd), 6) AS seasonal_index
    FROM d, t
    """,
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week multiplicative seasonal index over daily revenue
    (ISO weekday 1=Mon…7=Sun): average revenue on that weekday divided
    by the overall daily average — the seasonality decomposition that
    feeds staffing/capacity models. Exact decimal daily sums roll up to
    exact weekday sums; the index is a fixed two-division IEEE tree
    written identically in both engines. Two cheap shuffles (day, then
    7-row dow) + one broadcast scalar."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    d = daily.groupBy((F.weekday("day") + 1).cast("int").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("rev").alias("rev")
    )
    t = d.agg(
        F.sum("rev").alias("tot"), F.sum("n_days").cast("long").alias("nd")
    )
    return d.join(F.broadcast(t)).select(
        "dow",
        "n_days",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            (F.col("rev").cast("double") / F.col("n_days"))
            / (F.col("tot").cast("double") / F.col("nd")),
            6,
        ).alias("seasonal_index"),
    )




@register(
    "key_skew_report",
    oracle="""
    WITH k AS (
      SELECT l_partkey AS key, count(*) AS n FROM lineitem GROUP BY 1
    ), t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS nk
      FROM k
    )
    SELECT key, n AS n_rows,
           round(CAST(n AS DOUBLE) / total, 6) AS share_r6,
           round(CAST(n * nk AS DOUBLE) / total, 6) AS skew_x_r6
    FROM k, t ORDER BY n DESC, key LIMIT 20
    """,
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic over lineitem.l_partkey: the 20
    heaviest keys with row share and skew factor (rows ÷ the uniform
    per-key expectation) — the planning report that decides whether a
    join needs salting or AQE skew handling (see operators/skew.py).
    One grouped count + broadcast scalar totals + partial top-k; the
    key histogram never leaves the executors except the top rows."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    k = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = k.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("nk"),
    )
    return (
        k.join(F.broadcast(t))
        .select(
            "key",
            F.col("n").alias("n_rows"),
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share_r6"
            ),
            F.round(
                (F.col("n") * F.col("nk")).cast("double") / F.col("total"), 6
            ).alias("skew_x_r6"),
        )
        .orderBy(F.desc("n_rows"), "key")
        .limit(20)
    )




@register(
    "categorical_entropy_orders",
    oracle="""
    WITH cell AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY 1, 2
    ), tot AS (
      SELECT o_orderstatus, o_orderpriority, n,
             CAST(SUM(n) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS nt
      FROM cell
    )
    SELECT o_orderstatus, o_orderpriority, n,
           round(CAST(n AS DOUBLE) / nt, 6) AS p_r6,
           round(-(CAST(n AS DOUBLE) / nt) * ln(CAST(n AS DOUBLE) / nt), 6)
             AS entropy_term_r6
    FROM tot
    """,
)
def q_categorical_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy profile of the priority distribution within each
    order status — the column-profiling signal behind drift monitors
    and feature-selection screens. Emitted as per-cell −p·ln p
    contributions (the entropy is their sum) so the hash surface never
    depends on cross-cell float summation order; p is one exact-count
    division and ln comes from the same correctly-rounded libm on both
    engines (the BM25 oracle established the precedent at round-6).
    One shuffle to the ~15-cell contingency table; marginals are
    windows over the bounded cells."""
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    cell = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "nt",
            F.sum("n").over(Window.partitionBy("o_orderstatus")).cast("long"),
        )
    )
    p = F.col("n").cast("double") / F.col("nt")
    return cell.select(
        "o_orderstatus",
        "o_orderpriority",
        "n",
        F.round(p, 6).alias("p_r6"),
        F.round(-p * F.log(p), 6).alias("entropy_term_r6"),
    )




@register(
    "label_centroid_embeddings",
    oracle="""
    WITH x AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             unnest(embedding) AS v
      FROM embeddings
      WHERE embedding IS NOT NULL
    )
    SELECT label, dim, count(*) AS n_vectors,
           CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1048576) AS BIGINT))
                AS BIGINT) AS sum_scaled,
           round(CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1048576) AS BIGINT))
                      AS DOUBLE) / count(*) / 1048576.0, 6) AS centroid_r6
    FROM x GROUP BY 1, 2
    """,
)
def q_label_centroid_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the class-prototype
    aggregate behind SemDeDup cluster auditing, nearest-class-mean
    classification, and embedding-drift monitors. Element-wise means
    are float-summation-order-dependent, so the sum is fixed-point:
    each float scales by 2^20 (EXACT — a power-of-two scale of a
    float-derived double) and floors to bigint; sums are exact
    integers at any partitioning and the final division is one fixed
    IEEE tree. Plan: posexplode to (label, dim) grain — the shuffle
    carries (label, dim, long), never whole vectors — with map-side
    partial aggregation; 100 TB of vectors reduce to |labels|·|dims|
    rows."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("label", F.posexplode("embedding").alias("dim", "x"))
    )
    scaled = F.floor(F.col("x").cast("double") * 1048576).cast("long")
    return (
        emb.groupBy("label", F.col("dim").cast("int").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(scaled).alias("sum_scaled"),
        )
        .select(
            "label",
            "dim",
            "n_vectors",
            "sum_scaled",
            F.round(
                F.col("sum_scaled").cast("double")
                / F.col("n_vectors")
                / 1048576.0,
                6,
            ).alias("centroid_r6"),
        )
    )




@register(
    "gdpr_erasure_audit",
    oracle="""
    WITH subjects AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 = 13
    ), ords AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM subjects)
    )
    SELECT 'customer' AS table_name,
           (SELECT count(*) FROM subjects) AS n_rows_to_erase
    UNION ALL
    SELECT 'orders', (SELECT count(*) FROM ords)
    UNION ALL
    SELECT 'lineitem',
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM ords))
    """,
)
def q_gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure blast-radius audit: given a deterministic
    data-subject list (custkey ≡ 13 mod 97 stands in for the request
    queue), count the rows each table would lose when the delete
    cascades customer → orders → lineitem — the compliance dry-run
    every lakehouse needs before an actual GDPR/CCPA purge (the purge
    itself is `txlog` MERGE/delete territory). Cascade = two left-semi
    joins; the subject and order key sets broadcast at request-queue
    scale, so no fact-table shuffle."""
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    subjects = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 97 == 13)
        .select("c_custkey")
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(subjects),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(ords), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows_to_erase"),
        )

    return one("customer", subjects).unionAll(one("orders", ords)).unionAll(
        one("lineitem", li)
    )




@register(
    "mutual_info_region_priority",
    oracle="""
    WITH cell AS (
      SELECT c.c_mktsegment AS region, o.o_orderpriority AS priority,
             count(*) AS n
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT region, priority, n,
             CAST(SUM(n) OVER (PARTITION BY region) AS BIGINT) AS rt,
             CAST(SUM(n) OVER (PARTITION BY priority) AS BIGINT) AS ct,
             CAST(SUM(n) OVER () AS BIGINT) AS gt
      FROM cell
    )
    SELECT region, priority, n,
           round((CAST(n AS DOUBLE) / gt)
                 * ln((CAST(n AS DOUBLE) / gt)
                      / ((CAST(rt AS DOUBLE) / gt)
                         * (CAST(ct AS DOUBLE) / gt))), 6) AS mi_term_r6
    FROM tot
    """,
)
def q_mutual_info_region_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between market segment and order priority as
    per-cell p(x,y)·ln(p(x,y)/(p(x)p(y))) contributions — the
    feature-relevance measure that (unlike `chisq_region_priority`'s
    significance test) is directly comparable across feature pairs.
    Same bounded-contingency plan as the chi-square twin: one broadcast
    join + one shuffle to 25 cells, marginal windows over the bounded
    cells, exact-count divisions and one libm ln per cell, rounded at 6
    so the hash never sums floats across cells."""
    from pyspark.sql import Window

    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cell = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("region"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = (
        cell.withColumn(
            "rt", F.sum("n").over(Window.partitionBy("region")).cast("long")
        )
        .withColumn(
            "ct", F.sum("n").over(Window.partitionBy("priority")).cast("long")
        )
        .withColumn("gt", F.sum("n").over(Window.partitionBy()).cast("long"))
    )
    pxy = F.col("n").cast("double") / F.col("gt")
    px = F.col("rt").cast("double") / F.col("gt")
    py = F.col("ct").cast("double") / F.col("gt")
    return tot.select(
        "region",
        "priority",
        "n",
        F.round(pxy * F.log(pxy / (px * py)), 6).alias("mi_term_r6"),
    )
