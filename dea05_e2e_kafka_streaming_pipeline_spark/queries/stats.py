"""Registry queries: stats family. Split from queries.py
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
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
               * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
        AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY 1, 2
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped wide aggregate sweep over lineitem (the engine's
    heaviest scan+agg bench workload)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        pricing_summary,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return pricing_summary(load_table(spark, sf_dir, "lineitem"))




@register(
    "top_customers_per_region",
    oracle=f"""
    {_ENTITY_CTES},
    lv AS (
      SELECT customer_id, {_SUM_AMOUNT} AS lifetime_value
      FROM o GROUP BY customer_id
    ),
    j AS (SELECT lv.customer_id, c.region, lv.lifetime_value
          FROM lv JOIN c USING (customer_id)),
    r AS (SELECT region, customer_id, lifetime_value,
                 CAST(row_number() OVER (PARTITION BY region
                      ORDER BY lifetime_value DESC, customer_id) AS INT) AS rank
          FROM j)
    SELECT region, rank, customer_id, lifetime_value FROM r WHERE rank <= 3
    """,
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by lifetime value per region — ranking window
    (the capability the reference imported but never exercised)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        top_customers_per_region,
    )

    return top_customers_per_region(
        load_orders(spark, sf_dir), load_customers(spark, sf_dir), k=3
    )




@register(
    "revenue_by_geo",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           count(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def q_revenue_by_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join up the geography chain with broadcast dims."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import revenue_by_geo
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return revenue_by_geo(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )




@register(
    "documents_global_rownum",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY doc_id) AS rn,
             count(*) OVER () AS total
      FROM documents
    )
    SELECT doc_id, rn, ((rn - 1) * 4) // total + 1 AS bucket FROM n
    """,
)
def q_documents_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order global row numbering + exact equal-frequency
    4-bucket assignment via plans/analytics.py:global_row_number — the
    zipWithIndex-style range-partitioned plan, NOT the single-reducer
    `row_number() OVER (ORDER BY ...)` window the oracle uses (same
    rows, opposite scaling: the engine plan's widest exchange is a
    range shuffle across all partitions; plan-asserted no
    SinglePartition exchange in tests/test_plans.py)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        global_row_number,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    numbered = global_row_number(docs, ["doc_id"])
    total = numbered.agg(F.count(F.lit(1)).alias("total"))
    return (
        numbered.crossJoin(F.broadcast(total))
        .withColumn("bucket", F.expr("((rn - 1) * 4) div total + 1"))
        .select("doc_id", "rn", "bucket")
    )




@register(
    "price_quantity_correlation",
    oracle="""
    WITH m AS (
      SELECT count(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
      FROM lineitem
    )
    SELECT n,
           (sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
             AS covar_samp,
           (sxy - sx * sy / CAST(n AS DOUBLE))
             / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                    * (syy - sy * sy / CAST(n AS DOUBLE)))
             AS pearson_corr
    FROM m
    """,
)
def q_price_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation / covariance via exact decimal moment sums —
    order-insensitive under any partial-agg schedule, unlike built-in
    corr()/covar_samp() whose streaming-double results drift with
    partition order; final formulas evaluate once on the 1-row result."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        exact_moment_correlation,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return exact_moment_correlation(load_table(spark, sf_dir, "lineitem"))




@register(
    "order_price_histogram",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
                     WHEN o_totalprice >= 500000.0 THEN 21
                     ELSE floor((o_totalprice - 0.0) / 25000.0) + 1
                END AS INT) AS bucket,
           count(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_value
    FROM orders
    GROUP BY 1
    """,
)
def q_order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width order-value histogram (SQL-standard width_bucket,
    fixed domain bounds — no serializing min/max pre-scan): one
    map-side-combinable aggregate over ≤ 22 groups."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        equi_width_histogram,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return equi_width_histogram(
        load_table(spark, sf_dir, "orders"), "o_totalprice", 0.0, 500000.0, 20
    )




@register(
    "events_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n_events,
             SUM(CAST(value AS DECIMAL(18,6))) AS day_sum
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ), spine AS (
      SELECT user_id, CAST(gs AS DATE) AS day
      FROM span, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS t(gs)
    ), joined AS (
      SELECT s.user_id, s.day,
             coalesce(d.n_events, 0) AS n_events, d.day_sum
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day
    )
    SELECT user_id, day, n_events,
           coalesce(CAST(last_value(day_sum IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS DOUBLE), 0.0)
             AS locf_day_value,
           datediff('day',
             max(CASE WHEN n_events > 0 THEN day END) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS UNBOUNDED PRECEDING),
             day) AS days_since_activity
    FROM joined
    """,
)
def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily spine with zero-filled counts, LOCF daily
    value, and days-since-activity — resample/gap-fill without a
    calendar table: per-user sequence/explode bounded by the span,
    fill windows sharing one user exchange."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        gap_fill_daily,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return gap_fill_daily(load_table(spark, sf_dir, "events"))




@register(
    "events_active_users",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), days AS (
      SELECT DISTINCT day AS report_day FROM activity
    ), contrib AS (
      SELECT a.user_id, a.day AS active_day, CAST(gs AS DATE) AS report_day
      FROM activity a,
           UNNEST(generate_series(a.day, a.day + INTERVAL 27 DAY,
                                  INTERVAL 1 DAY)) AS t(gs)
    )
    SELECT c.report_day,
           count(DISTINCT CASE WHEN datediff('day', active_day, c.report_day) < 1
                               THEN user_id END) AS active_1d,
           count(DISTINCT CASE WHEN datediff('day', active_day, c.report_day) < 7
                               THEN user_id END) AS active_7d,
           count(DISTINCT CASE WHEN datediff('day', active_day, c.report_day) < 28
                               THEN user_id END) AS active_28d
    FROM contrib c JOIN days d ON c.report_day = d.report_day
    GROUP BY 1
    """,
)
def q_events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling DAU/WAU/MAU: activity dedups to (user, day) first,
    each fact explodes into the ≤28 report days it reaches, one
    conditional count-distinct aggregate serves all three widths."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        rolling_active_users,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return rolling_active_users(load_table(spark, sf_dir, "events"))




@register(
    "order_price_drift",
    oracle="""
    WITH ha AS (
      SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
                       WHEN o_totalprice >= 500000.0 THEN 21
                       ELSE floor((o_totalprice - 0.0) / 25000.0) + 1
                  END AS INT) AS bucket, count(*) AS n_a
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    ), hb AS (
      SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
                       WHEN o_totalprice >= 500000.0 THEN 21
                       ELSE floor((o_totalprice - 0.0) / 25000.0) + 1
                  END AS INT) AS bucket, count(*) AS n_b
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1
    ), counts AS (
      SELECT coalesce(ha.bucket, hb.bucket) AS bucket,
             coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
      FROM ha FULL OUTER JOIN hb ON ha.bucket = hb.bucket
    ), totals AS (
      SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts
    )
    SELECT bucket, n_a, n_b,
           round((greatest(CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE), 1e-6)
                  - greatest(CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE), 1e-6))
                 * ln(greatest(CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE), 1e-6)
                      / greatest(CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE), 1e-6)),
                 9) AS psi_term
    FROM counts, totals
    """,
)
def q_order_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between 1996 and 1997 order-value
    distributions: two tiny histogram aggregates, per-bucket PSI
    contributions localizing where the distribution moved (sum the
    column for the headline drift number)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import psi_drift
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")

    def year(y: int):
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        )

    return psi_drift(year(1996), year(1997), "o_totalprice", 0.0, 500000.0, 20)




# ---------------------------------------------------------------------------
# Sequential / frame-window analytics and multi-join TPC-H shapes (round 3)
# ---------------------------------------------------------------------------


@register(
    "customer_order_gaps",
    oracle=f"""
    {_ENTITY_CTES},
    g AS (
      SELECT customer_id,
             date_diff('day',
               lag(order_date) OVER (PARTITION BY customer_id
                                     ORDER BY order_date, order_id),
               order_date) AS gap_days
      FROM o
    )
    SELECT customer_id,
           count(*) AS n_orders,
           count(gap_days) AS n_gaps,
           min(gap_days) AS min_gap_days,
           max(gap_days) AS max_gap_days,
           CAST(SUM(gap_days) AS DOUBLE) / count(gap_days) AS avg_gap_days
    FROM g GROUP BY customer_id HAVING count(*) >= 2
    """,
)
def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap cadence per customer (lag window + re-grouped
    stats) — sequential analysis over the reference's orders entity
    (SURVEY §2.5 windows beyond ranking)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        customer_order_gaps,
    )

    return customer_order_gaps(load_orders(spark, sf_dir), min_orders=2)




@register(
    "running_monthly_revenue",
    oracle=f"""
    {_ENTITY_CTES},
    m AS (
      SELECT CAST(year(order_date) AS INT) AS o_year,
             CAST(month(order_date) AS INT) AS o_month,
             SUM(CAST(order_amount AS DECIMAL(18,2))) AS rev,
             count(*) AS n_orders
      FROM o GROUP BY 1, 2
    )
    SELECT o_year, o_month, n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (ORDER BY o_year, o_month
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS DOUBLE)
             AS cumulative_revenue,
           CAST(rev - lag(rev) OVER (ORDER BY o_year, o_month) AS DOUBLE)
             AS mom_delta,
           round(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6)
             AS share_of_total
    FROM m
    """,
)
def q_running_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative / month-over-month / share-of-total revenue — the
    frame-based window sweep (ROWS UNBOUNDED PRECEDING, lag, whole-frame
    total) over the post-aggregate month table."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        running_monthly_revenue,
    )

    return running_monthly_revenue(load_orders(spark, sf_dir))




@register(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2))
                       - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-table star join (same-nation customer and
    supplier) — the deepest join tree in the suite; dims broadcast,
    facts shuffle on natural keys."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        local_supplier_volume,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return local_supplier_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        region_name="ASIA",
        date_from="1996-01-01",
        date_to="1998-01-01",
    )




@register(
    "promo_revenue_share",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN
             CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
           ELSE CAST(0 AS DECIMAL(4,1)) END) AS DOUBLE) AS promo_revenue,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(4,2))
                - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS total_revenue,
      round(
        CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN
               CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
             ELSE CAST(0 AS DECIMAL(4,1)) END) AS DOUBLE) * 100.0
        / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2))
                  - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE),
        6) AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-07-01'
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion share: conditional decimal sums in one
    pass over a ship-date slice, part dim broadcast."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        promo_revenue_share,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return promo_revenue_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        date_from="1996-01-01",
        date_to="1996-07-01",
    )




@register(
    "cheapest_supplier_per_part",
    oracle="""
    WITH best AS (
      SELECT l.l_partkey, l.l_suppkey, p.p_name,
             l.l_extendedprice / l.l_quantity AS unit_price,
             row_number() OVER (
               PARTITION BY l.l_partkey
               ORDER BY l.l_extendedprice / l.l_quantity, l.l_suppkey
             ) AS rn
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_size <= 10
    )
    SELECT b.l_partkey AS part_key, b.p_name AS part_name,
           s.s_name AS supplier_name, n.n_name AS supplier_nation,
           round(b.unit_price, 6) AS best_unit_price
    FROM best b
    JOIN supplier s ON b.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE b.rn = 1
    """,
)
def q_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-flavored correlated minimum (lowest observed unit price
    per part) as a ranking window — no self-join, one shuffle on the
    part key."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        cheapest_supplier_per_part,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return cheapest_supplier_per_part(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "part"),
        max_size=10,
    )




@register(
    "bi_nation_trade_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2))
                       - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_name IN ('NATION_1', 'NATION_2')
      AND nc.n_name IN ('NATION_1', 'NATION_2')
      AND ns.n_name <> nc.n_name
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_bi_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bi-nation trade volume (both directed pairs, per
    ship year) — two pre-pruned broadcast legs over one lineitem⋈orders
    shuffle join."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        bi_nation_trade_volume,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return bi_nation_trade_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        nation_a="NATION_1",
        nation_b="NATION_2",
        date_from="1995-01-01",
        date_to="1997-01-01",
    )




@register(
    "disjunctive_part_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2))
                  - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS revenue,
      count(*) AS n_lineitems
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped OR-of-ANDs revenue: Catalyst extracts each
    side's implied disjunction and pushes it below the join, so neither
    scan reads rows no branch can accept."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        disjunctive_part_revenue,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return disjunctive_part_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )




@register(
    "part_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_size <= 20
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
      )
    GROUP BY 1, 2, 3
    """,
)
def q_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped distinct-supplier count per part attribute with
    a NOT-IN supplier exclusion, run as a broadcast anti-join."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        part_supplier_attr_counts,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return part_supplier_attr_counts(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        size_max=20,
        excl_brand="Brand#5",
        min_acctbal=1000.0,
    )




@register(
    "events_extreme_values",
    oracle="""
    SELECT event_id, event_type, value, pct_rank FROM (
      SELECT event_id, event_type, value,
             round(percent_rank() OVER (PARTITION BY event_type
                                        ORDER BY value), 6) AS pct_rank
      FROM events
    ) WHERE pct_rank >= 0.99
    """,
)
def q_events_extreme_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based extreme-value screen (≥ p99 within each event type) —
    percent_rank is pure rational arithmetic, so membership is
    engine-exact with no interpolated-quantile floats."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        percentile_outliers,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    return percentile_outliers(events, "event_type", "value", cutoff=0.99).select(
        "event_id", "event_type", "value", "pct_rank"
    )




@register(
    "approx_reach_violations",
    bench=False,
    oracle="""
    SELECT CAST(NULL AS VARCHAR) AS event_type,
           CAST(NULL AS BIGINT) AS approx_distinct,
           CAST(NULL AS BIGINT) AS exact_distinct,
           CAST(NULL AS DOUBLE) AS rel_err
    WHERE 1 = 0
    """,
)
def q_approx_reach_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkable companion for the HLL sketch: compute approx AND exact
    distinct user counts per event type in one aggregate and emit every
    key whose relative error exceeds 5× the configured rsd — the oracle
    expects zero rows (the sketch's accuracy contract, asserted inside
    the engine where the sketch actually runs)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        approx_distinct_report,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    return approx_distinct_report(events, "event_type", "user_id", rsd=0.01).filter(
        F.col("rel_err") > 0.05
    )




@register(
    "cohort_retention_weekly",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
      FROM events
    )
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.activity_week) / 7
                AS INTEGER) AS week_offset,
           count(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    WHERE a.activity_week >= c.cohort_week
    GROUP BY 1, 2
    """,
)
def q_cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly signup-cohort retention triangle — activity deduplicated
    to (user, week) pairs before the cohort join, so the expensive
    stage shrinks from |events| to |users|·|weeks|."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        cohort_retention,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return cohort_retention(load_table(spark, sf_dir, "events"))




@register(
    "sole_late_supplier",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), late AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM li
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name AS supplier_name, count(*) AS numwait
    FROM late t JOIN supplier s ON t.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = t.l_orderkey AND l2.l_suppkey <> t.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = t.l_orderkey AND l3.l_suppkey <> t.l_suppkey
      )
    GROUP BY s.s_name
    """,
)
def q_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped EXISTS / NOT-EXISTS blame query, decorrelated
    into order-keyed aggregates (the oracle keeps the correlated
    subquery form — same rows, independent plans)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        sole_late_supplier,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return sole_late_supplier(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "supplier"),
        late_after_days=90,
    )




@register(
    "quantile_sketch_violations",
    bench=False,
    oracle="""
    SELECT CAST(NULL AS VARCHAR) AS event_type,
           CAST(NULL AS DOUBLE) AS pct,
           CAST(NULL AS DOUBLE) AS approx_val,
           CAST(NULL AS BIGINT) AS min_rank,
           CAST(NULL AS BIGINT) AS max_rank
    WHERE 1 = 0
    """,
)
def q_quantile_sketch_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkable companion for the approximate-percentile sketch: audit
    every (event_type, percentile) against percentile_approx's rank-error
    guarantee and emit violations — the oracle expects zero rows (the
    contract the 100 TB percentile path rests on, asserted inside the
    engine where the sketch actually runs)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        quantile_sketch_report,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    return (
        quantile_sketch_report(events, "event_type", "value", accuracy=1000)
        .filter(F.col("violation"))
        .select("event_type", "pct", "approx_val", "min_rank", "max_rank")
    )




@register(
    "events_burst_detection",
    oracle="""
    SELECT event_id, user_id, ts, n_trailing FROM (
      SELECT event_id, user_id, ts,
             count(*) OVER (PARTITION BY user_id
                            ORDER BY CAST(epoch_us(ts) AS BIGINT)
                            RANGE BETWEEN 7200000000 PRECEDING
                            AND CURRENT ROW) AS n_trailing
      FROM events
    ) WHERE n_trailing >= 3
    """,
)
def q_events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity screen: events whose user produced ≥3 events in the
    trailing 2 hours — the time-RANGE window frame (microsecond
    anchor) complementing the row-based and session windows elsewhere."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        trailing_window_counts,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    return (
        trailing_window_counts(events, "user_id", "ts", window_seconds=7200)
        .filter(F.col("n_trailing") >= 3)
        .select("event_id", "user_id", "ts", "n_trailing")
    )




@register(
    "priority_waiting_orders",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY 1
    """,
)
def q_priority_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS count: orders in one quarter with a
    lineitem shipped >90 days late, per priority — the EXISTS runs as a
    LEFT SEMI join with the late-ship residual on the join condition."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        priority_waiting_orders,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return priority_waiting_orders(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )




@register(
    "nation_market_share",
    oracle="""
    WITH joined AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2))
                  - CAST(l.l_discount AS DECIMAL(4,2))) AS rev,
             ns.n_name = 'NATION_8' AS is_share
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
        AND o.o_custkey IN (
          SELECT c.c_custkey
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'ASIA'
        )
    )
    SELECT order_year,
           CAST(SUM(CASE WHEN is_share THEN rev END) AS DOUBLE)
             AS share_revenue,
           CAST(SUM(rev) AS DOUBLE) AS total_revenue,
           round(CAST(SUM(CASE WHEN is_share THEN rev END) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 6) AS market_share
    FROM joined GROUP BY 1
    """,
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: NATION_8's revenue share of the
    ASIA customer market per order year — numerator and denominator as
    conditional sums in ONE aggregate over one shuffle join."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        nation_market_share,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return nation_market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )




@register(
    "product_type_profit",
    oracle="""
    SELECT n.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2))
                       - CAST(l.l_discount AS DECIMAL(4,2)))
                    - CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(0.60 AS DECIMAL(4,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit by (supplier nation, order year) for parts
    named like '%bolt%' — two broadcast dims + one shuffle join, exact
    decimal profit arithmetic (supply cost = 0.60 × retail price; the
    schema has no partsupp)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        product_type_profit,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return product_type_profit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "part"),
    )




@register(
    "returnflag_priority_counts",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q_returnflag_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional counts per lineitem category (return
    flag stands in for ship mode): critical vs other order priorities,
    one pass, map-side combinable."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        returnflag_priority_counts,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return returnflag_priority_counts(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
    )




@register(
    "customer_order_distribution",
    oracle="""
    SELECT order_count, count(*) AS customer_count
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS order_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'P'
      GROUP BY 1
    )
    GROUP BY 1
    """,
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped order-count histogram: LEFT OUTER join keeps
    zero-order customers (the status filter sits on the orders side
    BEFORE the join), then two map-side-combinable aggregates."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        customer_order_distribution,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return customer_order_distribution(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )




@register(
    "top_supplier_revenue",
    oracle="""
    WITH per_supp AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(4,2))
                         - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, p.total_revenue
    FROM per_supp p JOIN supplier s ON p.l_suppkey = s.s_suppkey
    WHERE p.total_revenue = (SELECT max(total_revenue) FROM per_supp)
    """,
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: quarter revenue per supplier, keep
    the max (ties kept) — rank() over the |suppliers|-row aggregate,
    never over the fact table."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        top_supplier_revenue,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return top_supplier_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )




@register(
    "forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS forecast_revenue,
           count(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped filter-and-sum: every predicate pushes to the
    scan, 2-column projection, 1-row result — the pruned-scan
    throughput benchmark (plan-asserted in tests/test_plans.py)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        forecast_revenue_change,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return forecast_revenue_change(load_table(spark, sf_dir, "lineitem"))




@register(
    "important_part_value",
    oracle="""
    WITH pp AS (
      SELECT l.l_partkey AS p_partkey,
             SUM(CAST(l.l_quantity AS DECIMAL(12,2))
                 * CAST(l.l_extendedprice AS DECIMAL(12,2))) AS val_dec
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#1'
      GROUP BY 1
    )
    SELECT p_partkey, CAST(val_dec AS DOUBLE) AS part_value
    FROM pp
    WHERE CAST(val_dec AS DOUBLE)
          > (SELECT CAST(SUM(val_dec) AS DOUBLE) FROM pp) * 0.001
    """,
)
def q_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important-stock screen (reshaped over lineitem —
    the testdata has no partsupp): per-part value vs a fraction of the
    grand total, the scalar landing as a broadcast cross-join so the
    fact scans once."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        important_part_value,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return important_part_value(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )




@register(
    "excess_shipment_suppliers",
    oracle="""
    WITH pair AS (
      SELECT l.l_suppkey, l.l_partkey,
             SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS qty_dec
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type LIKE 'PROMO%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ), flagged AS (
      SELECT l_suppkey, qty_dec
      FROM (
        SELECT l_suppkey, qty_dec,
               CAST(SUM(qty_dec) OVER (PARTITION BY l_partkey) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY l_partkey) AS part_avg_qty
        FROM pair
      )
      WHERE CAST(qty_dec AS DOUBLE) > part_avg_qty * 1.5
    ), per_supp AS (
      SELECT l_suppkey, count(*) AS excess_parts,
             CAST(SUM(qty_dec) AS DOUBLE) AS excess_qty
      FROM flagged GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, f.excess_parts, f.excess_qty
    FROM per_supp f JOIN supplier s ON f.l_suppkey = s.s_suppkey
    """,
)
def q_excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped excess-shipment screen: the nested correlated
    subqueries decorrelated into one (supplier, part)-grain aggregate +
    a partkey window reusing its exchange — no second fact scan."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        excess_shipment_suppliers,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return excess_shipment_suppliers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
    )




@register(
    "customer_pareto_deciles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS customer_id,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT customer_id, cents,
             row_number() OVER (ORDER BY cents DESC, customer_id) AS rn,
             count(*) OVER () AS nc,
             CAST(SUM(cents) OVER () AS BIGINT) AS total_cents
      FROM spend
    )
    SELECT CAST((rn - 1) * 10 // nc + 1 AS INT) AS decile,
           count(*) AS n_customers,
           CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100 AS revenue,
           round(CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / total_cents, 6)
             AS share_r6
    FROM ranked
    GROUP BY 1, total_cents
    """,
)
def q_customer_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration of revenue across customer deciles (the
    80/20 audit): customers rank by exact integer-cents spend, split
    into exact equal-frequency deciles, each reporting its revenue
    share. The ranking uses plans/analytics.py:global_row_number — the
    zipWithIndex-style range-shuffle plan, NOT the single-reducer
    `row_number() OVER (ORDER BY ...)` the oracle uses (same rows,
    opposite scaling). Spend, decile boundaries, and shares are all
    exact integer arithmetic; the one division per decile rounds at
    6."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        global_row_number,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
        .withColumn("neg_cents", -F.col("cents"))
    )
    ranked = global_row_number(spend, ["neg_cents", "customer_id"])
    tot = ranked.agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    return (
        ranked.join(F.broadcast(tot))
        .groupBy(
            (((F.col("rn") - 1) * 10 / F.col("nc")).cast("int") + 1).alias(
                "decile"
            ),
            "total_cents",
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            "decile",
            "n_customers",
            (F.col("sum_cents").cast("double") / 100).alias("revenue"),
            F.round(
                F.col("sum_cents").cast("double") / F.col("total_cents"), 6
            ).alias("share_r6"),
        )
    )




@register(
    "hbos_outlier_orders",
    oracle="""
    WITH per AS (
      SELECT o.o_orderkey AS order_id,
             CAST(o.o_totalprice AS DOUBLE) AS f1,
             CAST(li.n_items AS DOUBLE) AS f2
      FROM orders o JOIN (
        SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY 1
      ) li ON li.l_orderkey = o.o_orderkey
    ), stats AS (
      SELECT min(f1) AS min1, max(f1) AS max1,
             min(f2) AS min2, max(f2) AS max2, count(*) AS n
      FROM per
    ), binned AS (
      SELECT p.order_id, s.n,
        CASE WHEN s.max1 > s.min1 THEN LEAST(CAST(floor(
          (p.f1 - s.min1) / (s.max1 - s.min1) * 16) AS INT), 15)
        ELSE 0 END AS bin_f1,
        CASE WHEN s.max2 > s.min2 THEN LEAST(CAST(floor(
          (p.f2 - s.min2) / (s.max2 - s.min2) * 16) AS INT), 15)
        ELSE 0 END AS bin_f2
      FROM per p CROSS JOIN stats s
    ), h1 AS (SELECT bin_f1, count(*) AS c1 FROM binned GROUP BY 1),
    h2 AS (SELECT bin_f2, count(*) AS c2 FROM binned GROUP BY 1)
    SELECT b.order_id, b.bin_f1, b.bin_f2,
           CAST(round(ln(CAST(b.n AS DOUBLE) / c1) * 1e6, 0) AS BIGINT)
           + CAST(round(ln(CAST(b.n AS DOUBLE) / c2) * 1e6, 0) AS BIGINT)
             AS hbos_micro
    FROM binned b JOIN h1 USING (bin_f1) JOIN h2 USING (bin_f2)
    ORDER BY hbos_micro DESC, order_id LIMIT 25
    """,
)
def q_hbos_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 multivariate outlier orders by Histogram-Based Outlier
    Score over (order value, item count): equal-width 16-bin histograms
    per feature, score = Σ −ln(bin density) in exact micro-nats — the
    linear-time anomaly screen that needs only broadcast-joined
    histograms, no pair space (plans/analytics.py:hbos_scores)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import hbos_scores
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    items = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    per = orders.join(items, orders.o_orderkey == items.l_orderkey).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").cast("double").alias("f1"),
        F.col("n_items").cast("double").alias("f2"),
    )
    return hbos_scores(per, ["f1", "f2"], "order_id", bins=16, k=25)




@register(
    "ks_price_drift",
    oracle="""
    WITH t AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                  THEN 1 ELSE 0 END AS a
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ), c AS (
      SELECT v, SUM(a) AS n_a, SUM(1 - a) AS n_b FROM t GROUP BY v
    ), cum AS (
      SELECT v,
             SUM(n_a) OVER (ORDER BY v) AS ca,
             SUM(n_b) OVER (ORDER BY v) AS cb
      FROM c
    ), tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM c)
    SELECT CAST(ta AS BIGINT) AS n_a,
           CAST(tb AS BIGINT) AS n_b,
           CAST(MAX(ABS(ca * tb - cb * ta)) AS BIGINT) AS d_num,
           ROUND(CAST(MAX(ABS(ca * tb - cb * ta)) AS DOUBLE)
                 / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 9) AS d_stat
    FROM cum, tot GROUP BY ta, tb
    """,
)
def q_ks_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D between the 1996 and 1997
    order-value distributions — the binning-free companion to
    ``order_price_drift``'s PSI: sup-norm ECDF distance with the
    numerator in exact integer arithmetic (only the final division is
    floating point), cumulative counts via the range-shuffle
    ``global_cumsum`` rather than a single-partition window."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        ks_two_sample,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")

    def year(y: int):
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        )

    return ks_two_sample(year(1996), year(1997), "o_totalprice")




@register(
    "mannwhitney_price_shift",
    oracle="""
    WITH t AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                  THEN 1 ELSE 0 END AS a
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ), c AS (
      SELECT v, SUM(a) AS n_a, SUM(1 - a) AS n_b, COUNT(*) AS n_v
      FROM t GROUP BY v
    ), cum AS (
      SELECT v, n_a, n_b, n_v, SUM(n_v) OVER (ORDER BY v) AS cnv FROM c
    ), agg AS (
      SELECT SUM(n_a) AS na, SUM(n_b) AS nb,
             SUM(n_a * (2 * (cnv - n_v) + n_v + 1)) AS two_ra,
             SUM(n_v * n_v * n_v - n_v) AS ties
      FROM cum
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(two_ra - na * (na + 1) AS BIGINT) AS u2_a,
           ROUND(
             (CAST(two_ra - na * (na + 1) AS DOUBLE)
              - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
             / (2.0 * sqrt(
                 (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0)
                 * ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1)
                    - CAST(ties AS DOUBLE)
                      / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                         * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 1))))),
             6) AS z
    FROM agg
    """,
)
def q_mannwhitney_price_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U (tie-corrected z) between 1996 and 1997
    order values — the nonparametric location test beside the KS
    distribution test and Welch's mean test: doubled-integer midrank
    algebra over the same value-grain + global_cumsum scaffolding, one
    sqrt at the end."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        mann_whitney_u,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")

    def year(y: int):
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        )

    return mann_whitney_u(year(1996), year(1997), "o_totalprice")




@register(
    "theil_sen_revenue_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(datediff('day', DATE '1992-01-01',
                           CAST(o_orderdate AS DATE)) AS DOUBLE) AS x,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                       AS BIGINT) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ), slopes AS (
      -- HUGEINT intermediates (mirrors the engine's decimal(38,0)):
      -- extreme pairwise slopes of a cents series overflow int64 at
      -- the 1e-9 grain; only the median surfaces, cast back to BIGINT
      SELECT CAST(round((b.y - a.y) / (b.x - a.x) * 1e9, 0) AS HUGEINT)
               AS slope_q
      FROM daily a JOIN daily b ON a.x < b.x
    ), sm AS (
      SELECT slope_q FROM (
        SELECT slope_q,
               row_number() OVER (ORDER BY slope_q) AS rn,
               count(*) OVER () AS n
        FROM slopes
      ) WHERE rn = (n + 1) // 2
    ), resid AS (
      -- exact decimal form y·1e9 − slope_q·x (mirrors the engine):
      -- the double form y·1e9 passes 2^53 on a cents series, where
      -- each engine's double→integer digit rendering differs
      SELECT CAST(CAST(d.y AS DECIMAL(20,6))
                    * CAST(1000000000 AS DECIMAL(10,0))
                  - CAST(sm.slope_q AS DECIMAL(18,0))
                    * CAST(d.x AS DECIMAL(20,6))
                  AS DECIMAL(38,0)) AS icept_q
      FROM daily d, sm
    ), im AS (
      SELECT icept_q FROM (
        SELECT icept_q,
               row_number() OVER (ORDER BY icept_q) AS rn,
               count(*) OVER () AS n
        FROM resid
      ) WHERE rn = (n + 1) // 2
    )
    SELECT (SELECT count(*) FROM daily) AS n_points,
           (SELECT count(*) FROM slopes) AS n_pairs,
           -- VARCHAR here: duckdb->pandas degrades HUGEINT/DECIMAL
           -- columns to float64, breaking the exact compare, and a
           -- BIGINT cast (the old compromise) overflows at the x10
           -- tier; the digit string compares exactly against the
           -- engine's decimal(38,0) at EVERY tier (the hash normalizer
           -- stringifies both sides)
           CAST(sm.slope_q AS VARCHAR) AS slope_q,
           CAST(im.icept_q AS VARCHAR) AS intercept_q,
           CAST(sm.slope_q AS DOUBLE) / 1e9 AS slope,
           CAST(im.icept_q AS DOUBLE) / 1e9 AS intercept
    FROM sm, im
    """,
)
def q_theil_sen_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue (integer cents): median
    pairwise slope over the bounded daily series, rank-defined medians
    (value at row (n+1)//2 via global_row_number, never an
    interpolating percentile) — the outlier-immune companion to the
    OLS forecast_revenue fit."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import theil_sen
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
        .cast("double")
        .alias("x")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .cast("double")
        .alias("y")
    )
    return theil_sen(daily, "x", "y")




@register(
    "spearman_price_quantity",
    oracle="""
    WITH r AS (
      SELECT CAST(2 * RANK() OVER (ORDER BY l_extendedprice)
                  + COUNT(*) OVER (PARTITION BY l_extendedprice) - 1
                  AS BIGINT) AS rx,
             CAST(2 * RANK() OVER (ORDER BY l_quantity)
                  + COUNT(*) OVER (PARTITION BY l_quantity) - 1
                  AS BIGINT) AS ry
      FROM lineitem
    ), mo AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             SUM(CAST(rx AS HUGEINT)) AS sx,
             SUM(CAST(ry AS HUGEINT)) AS sy,
             SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
             SUM(CAST(ry AS HUGEINT) * ry) AS syy,
             SUM(CAST(rx AS HUGEINT) * ry) AS sxy
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 9) AS rho
    FROM mo
    """,
)
def q_spearman_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation between lineitem extended price
    and quantity — midrank ties as doubled integers from the
    value-grain + global_cumsum scaffold (the oracle uses a
    single-partition RANK window instead: same rows, opposite
    scaling), moments exact in decimal(38,0), one divide+sqrt at the
    end. Complements the exact-moment Pearson
    `price_quantity_correlation`."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        spearman_corr,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return spearman_corr(li, "l_extendedprice", "l_quantity")




@register(
    "ks_monthly_price_drift",
    oracle="""
    WITH t AS (
      SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
             o_totalprice AS v,
             CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                  THEN 1 ELSE 0 END AS a
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ), c AS (
      SELECT m, v, SUM(a) AS n_a, SUM(1 - a) AS n_b FROM t GROUP BY 1, 2
    ), cum AS (
      SELECT m,
             SUM(n_a) OVER (PARTITION BY m ORDER BY v) AS ca,
             SUM(n_b) OVER (PARTITION BY m ORDER BY v) AS cb
      FROM c
    ), tot AS (
      SELECT m, CAST(MAX(ca) AS BIGINT) AS ta, CAST(MAX(cb) AS BIGINT) AS tb
      FROM cum GROUP BY 1
    )
    SELECT cum.m AS month, ta AS n_a, tb AS n_b,
           CAST(MAX(ABS(ca * tb - cb * ta)) AS BIGINT) AS d_num,
           round(CAST(MAX(ABS(ca * tb - cb * ta)) AS DOUBLE)
                 / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 9) AS d_stat
    FROM cum JOIN tot ON cum.m = tot.m
    GROUP BY cum.m, ta, tb
    """,
)
def q_ks_monthly_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month KS drift monitor: the 1996-vs-1997 order-value KS
    statistic at month-of-year grain — the monitoring table that says
    WHERE the distribution moved (the global `ks_price_drift` says
    whether). Group-partitioned cumulative windows run in parallel per
    month; exact integer numerators throughout."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import ks_by_group
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")

    def year(y: int):
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select(
            F.month(F.col("o_orderdate").cast("date")).cast("long").alias("month"),
            "o_totalprice",
        )

    return ks_by_group(year(1996), year(1997), "o_totalprice", ["month"])


@register(
    "isotonic_priority_rate",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000.0) AS BIGINT)
               AS bin,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ), bins AS (
      SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS s
      FROM b GROUP BY 1
    ), seg AS (
      SELECT j.bin AS j, k.bin AS k,
             CAST(sum(m.s) AS DOUBLE) / CAST(sum(m.n) AS DOUBLE) AS avg_jk
      FROM bins j
      JOIN bins k ON j.bin <= k.bin
      JOIN bins m ON m.bin BETWEEN j.bin AND k.bin
      GROUP BY 1, 2
    ), fit AS (
      SELECT i, max(minavg) AS iso FROM (
        SELECT i.bin AS i, seg.j AS j, min(seg.avg_jk) AS minavg
        FROM bins i
        JOIN seg ON seg.j <= i.bin AND seg.k >= i.bin
        GROUP BY 1, 2
      ) GROUP BY 1
    )
    SELECT bins.bin, bins.n AS n_rows,
           round(CAST(bins.s AS DOUBLE) / CAST(bins.n AS DOUBLE), 6)
             AS raw_rate,
           round(fit.iso, 6) AS isotonic_rate
    FROM bins JOIN fit ON fit.i = bins.bin
    """,
)
def q_isotonic_priority_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of P(high-priority) against order value via
    the pool-adjacent-violators CLOSED FORM, max_{j≤i} min_{k≥i}
    mean(y over bins j..k) (plans/analytics.py:isotonic_calibration) —
    PAV without the sequential pooling loop: one map-side-combining
    aggregate reduces the fact table to ~20 fixed-width price bins and
    the max-min evaluates on the bounded bin relation (B³ segment
    rows, constant at any SF, every post-aggregate join broadcast).
    The training-data use is quality-score calibration before
    threshold filtering."""
    from dea05_e2e_kafka_streaming_pipeline_spark.plans.analytics import (
        isotonic_calibration,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("long")
        .alias("y"),
    )
    return isotonic_calibration(
        orders, score_col="o_totalprice", label_col="y", bin_width=25000.0
    )
