"""Registry queries: misc_ops family. Split from queries.py
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
    "salted_region_sales",
    oracle=f"""
    {_ENTITY_CTES}
    SELECT c.region AS region,
           count(*) AS n_orders,
           CAST(SUM(CAST(o.order_amount AS DECIMAL(18,2))) AS DOUBLE)
             AS total_revenue
    FROM o JOIN c USING (customer_id)
    GROUP BY 1
    """,
)
def q_salted_region_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's deliberately skewed join (50 customer ids carry
    every order — SURVEY §7.4 risk 5) executed through the explicit
    salt-split: fact rows scatter across num_salts sub-keys, the dim
    replicates n×, and each hot customer's rows land on n reducers
    instead of one. The oracle is the PLAIN join — salting must be
    invisible in the result, which is exactly what the hash-match
    proves (AQE skew-join stays on as the first line of defense;
    this is the fallback when the planner can't see the skew)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.skew import salted_join

    orders = load_orders(spark, sf_dir)
    customers = load_customers(spark, sf_dir).select("customer_id", "region")
    joined = salted_join(orders, customers, "customer_id", num_salts=8)
    return joined.groupBy("region").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("order_amount").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_revenue"),
    )




# ---------------------------------------------------------------------------
# Event-stream analytics (engine streaming layer, oracle-checked in batch
# mode — windowed_event_stats runs identically under readStream with a
# watermark; see streaming/pipeline.py and tests/test_streaming.py).
# ---------------------------------------------------------------------------

@register(
    "clicks_asof_views",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    views AS (
      SELECT user_id, ts,
             max(value) AS value          -- unique per (user, ts): determinism
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.ts, c.value,
           v.ts AS asof_ts, v.value AS asof_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks natively — operators/asof.py):
    for every click, the user's most recent view at or before it.
    Oracle-checked against DuckDB's native ASOF JOIN."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import asof_join
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(
        clicks, views, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"],
    ).withColumnRenamed("asof_value", "asof_value")




@register(
    "clicks_asof_views_bounded",
    bench=False,
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    views AS (
      SELECT user_id, ts,
             max(value) AS value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ), matched AS (
      SELECT c.event_id, c.user_id, c.ts, c.value,
             v.ts AS asof_ts, v.value AS asof_value
      FROM clicks c ASOF LEFT JOIN views v
        ON c.user_id = v.user_id AND c.ts >= v.ts
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN date_diff('microsecond', asof_ts, ts) <= 3600000000
                THEN asof_ts END AS asof_ts,
           CASE WHEN date_diff('microsecond', asof_ts, ts) <= 3600000000
                THEN asof_value END AS asof_value
    FROM matched
    """,
)
def q_asof_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas merge_asof(tolerance=...)
    semantics): a view more than 1 hour before the click no longer
    counts — the oracle applies the same bound over DuckDB's native
    ASOF JOIN."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import asof_join
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(
        clicks, views, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], tolerance_seconds=3600,
    )




@register(
    "events_interval_join",
    oracle="""
    WITH iv AS (
      SELECT i AS window_id,
             TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 11 HOUR AS start_ts,
             TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 11 HOUR
               + INTERVAL 90 MINUTE AS end_ts
      FROM range(0, 60) t(i)
    )
    SELECT e.event_id, iv.window_id, iv.start_ts, iv.end_ts
    FROM events e JOIN iv ON e.ts BETWEEN iv.start_ts AND iv.end_ts
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (events × 90-minute maintenance windows)
    via the bucketed rewrite in operators/asof.py:interval_join — an
    equi-join on hour buckets + exact range filter, instead of the
    BroadcastNestedLoopJoin Spark plans for a raw BETWEEN condition
    (plan-asserted). Oracle: DuckDB's native range join."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import interval_join
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    iv = spark.range(60).select(
        F.col("id").alias("window_id"),
        F.expr(
            "timestampadd(HOUR, CAST(11 * id AS INT), "
            "timestamp'2024-01-01 00:00:00')"
        ).alias("start_ts"),
    ).withColumn("end_ts", F.expr("timestampadd(MINUTE, 90, start_ts)"))
    out = interval_join(events, iv, "ts", "start_ts", "end_ts", bucket="1 hour")
    return out.select("event_id", "window_id", "start_ts", "end_ts")




@register(
    "events_session_paths",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM x
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, session_seq
                                ORDER BY ts, event_id) AS rn
      FROM s
    ), per AS (
      SELECT user_id, session_seq, count(*) AS n_events,
             string_agg(CASE WHEN rn <= 20 THEN event_type END,
                        '>' ORDER BY ts, event_id)
               || CASE WHEN count(*) > 20 THEN '>…' ELSE '' END AS path
      FROM r GROUP BY 1, 2
    )
    SELECT path, count(*) AS n_sessions
    FROM per GROUP BY 1
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 within-session event-type sequences (path mining /
    journey discovery): sessionize shares its user exchange, paths
    build from array_sort'd collected structs with bounded truncation,
    top-k over |sessions| rows."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sessionize import (
        session_paths,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return session_paths(load_table(spark, sf_dir, "events"))




@register(
    "events_sessionization",
    oracle="""
    WITH x AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM x GROUP BY user_id
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) per user via analytic windows —
    lag + conditional cumsum, one shuffle on user_id."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sessionize import (
        session_summary,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return session_summary(load_table(spark, sf_dir, "events"))




@register(
    "event_funnel_users",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS view_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.view_ts
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.click_ts
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.view_ts, s2.click_ts, s3.purchase_ts,
           CAST(1 + (CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END)
                AS INTEGER) AS stage_reached
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def q_event_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click→purchase funnel: per-user earliest strictly-ordered
    completion times in ONE hash aggregate (sorted fold inside the
    aggregate projection) — the oracle proves the greedy fold equals
    the min-then-min join formulation."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sessionize import (
        event_funnel,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return event_funnel(
        load_table(spark, sf_dir, "events"), steps=("view", "click", "purchase")
    )




@register(
    "clicks_asof_next_view",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    views AS (
      SELECT user_id, ts,
             max(value) AS value          -- unique per (user, ts): determinism
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.ts, c.value,
           v.ts AS asof_ts, v.value AS asof_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts <= v.ts
    """,
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every click, the user's next view at or
    after it — the attribution-lookahead direction, oracle-checked
    against DuckDB's native forward ASOF (``c.ts <= v.ts``)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import asof_join
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(
        clicks, views, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], direction="forward",
    )




@register(
    "subsequence_search_events",
    oracle=f"""
    WITH w AS (
      SELECT user_id, ts AS start_ts, event_id AS start_id,
             list(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS win
      FROM events
    )
    SELECT user_id, start_ts, start_id,
           CAST(list_sum(list_transform(win, (x, i) ->
             CAST((x - ({_TS_PATTERN_SQL})[i])
                * (x - ({_TS_PATTERN_SQL})[i]) AS DECIMAL(32,12))))
             AS DOUBLE) AS dist2
    FROM w
    WHERE len(win) = 8
    ORDER BY dist2, user_id, start_ts, start_id
    LIMIT 20
    """,
)
def q_subsequence_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence similarity search (operators/
    timeseries.py:subsequence_search, the EDBT'19 streaming-similarity
    workload): the 20 per-user sliding windows of length 8 closest to a
    fixed query pattern by EXACT squared-Euclidean distance — windows
    come straight from a window-frame collect_list (no self-join),
    distance is a decimal-exact zip_with/aggregate fold (order-proof),
    top-k is TakeOrderedAndProject. The oracle rebuilds the identical
    windows and decimal arithmetic with DuckDB's framed list() and
    indexed list_transform."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.timeseries import (
        subsequence_search,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return subsequence_search(
        load_table(spark, sf_dir, "events"),
        _TS_PATTERN,
        k=20,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
    )




@register(
    "subsequence_shape_events",
    oracle=f"""
    WITH w AS (
      SELECT user_id, ts AS start_ts, event_id AS start_id,
             list(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS win
      FROM events
    ), c AS (
      SELECT user_id, start_ts, start_id,
             list_transform(win, x -> CAST(
               CAST(x AS DECIMAL(22,6)) * 8
               - CAST(list_sum(win) AS DECIMAL(22,6)) AS DECIMAL(24,6))) AS cw
      FROM w WHERE len(win) = 8
    )
    SELECT user_id, start_ts, start_id,
           CAST(list_sum(list_transform(cw, (x, i) ->
             CAST((x - ({_TS_CPATTERN_SQL})[i])
                * (x - ({_TS_CPATTERN_SQL})[i]) AS DECIMAL(32,12))))
             AS DOUBLE) AS dist2
    FROM c
    ORDER BY dist2, user_id, start_ts, start_id
    LIMIT 20
    """,
)
def q_subsequence_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-invariant (mean-centered) subsequence matching — the
    shape-similarity half of UCR z-normalization, division-free via
    the scaled form Σ(m·xᵢ − S)² = m²·Σ(xᵢ − μ)² so every intermediate
    stays an exact decimal (operators/timeseries.py:subsequence_search
    with center=True). Finds windows shaped like the query pattern at
    ANY vertical offset; `subsequence_search_events` is the raw-level
    twin."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.timeseries import (
        subsequence_search,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    return subsequence_search(
        load_table(spark, sf_dir, "events"),
        _TS_PATTERN,
        k=20,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
        center=True,
    )




@register(
    "revenue_stl_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), st AS (
      SELECT d, cents,
             SUM(cents) OVER (
               ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tsum,
             COUNT(cents) OVER (
               ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tcnt,
             date_diff('day', DATE '1995-01-01', d) % 7 AS phase
      FROM daily
    ), dt AS (
      SELECT *, CASE WHEN tcnt = 7 THEN 7 * cents - tsum END AS det FROM st
    ), ph AS (
      SELECT *, SUM(det) OVER (PARTITION BY phase) AS s_num,
                COUNT(det) OVER (PARTITION BY phase) AS s_cnt
      FROM dt
    )
    SELECT d, phase, cents / 100.0 AS value,
           CASE WHEN tcnt = 7 THEN round(tsum / 700.0, 4) END AS trend_r4,
           CASE WHEN s_cnt > 0
                THEN round(s_num / (700.0 * s_cnt), 4) END AS seasonal_r4,
           CASE WHEN det IS NOT NULL AND s_cnt > 0
                THEN round((det * s_cnt - s_num) / (700.0 * s_cnt), 4)
           END AS residual_r4
    FROM ph
    """,
)
def q_revenue_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual decomposition of daily revenue
    (7-day centered-MA trend, anchored weekly phase means) — the
    moving-average core of STL. Integer-cents fixed-point throughout
    with one final double division per component, so the decomposition
    hash-matches DuckDB exactly (operators/timeseries.py:
    seasonal_decompose). Upgrades `dow_seasonality_revenue` from
    per-DOW summary rows to a full per-day decomposition with
    explicit residuals (the anomaly-scoring input)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    return seasonal_decompose(daily, date_col="day", cents_col="cents")




@register(
    "kaplan_meier_churn",
    oracle="""
    WITH percust AS (
      SELECT o_custkey,
             min(CAST(o_orderdate AS DATE)) AS first_d,
             max(CAST(o_orderdate AS DATE)) AS last_d
      FROM orders GROUP BY 1
    ), horizon AS (
      SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders
    ), life AS (
      SELECT date_diff('day', first_d, last_d) AS t,
             CASE WHEN date_diff('day', last_d, maxd) > 90
                  THEN 1 ELSE 0 END AS event
      FROM percust CROSS JOIN horizon
    ), per_t AS (
      SELECT t, count(*) AS n_total,
             CAST(SUM(event) AS BIGINT) AS n_events
      FROM life GROUP BY 1
    ), pop AS (SELECT count(*) AS pop FROM life),
    staged AS (
      SELECT t, n_total, n_events,
             pop - COALESCE(SUM(n_total) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_at_risk
      FROM per_t CROSS JOIN pop
    ), scored AS (
      SELECT t, n_at_risk, n_events, n_total - n_events AS n_censored,
             SUM(CASE
               WHEN n_events > 0 AND n_events < n_at_risk THEN
                 CAST(round(ln(
                   CAST(n_at_risk - n_events AS DOUBLE)
                   / CAST(n_at_risk AS DOUBLE)) * 1e9) AS BIGINT)
               WHEN n_events = 0 THEN 0
             END) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_nano,
             MAX(CASE WHEN n_events > 0 AND n_events = n_at_risk
                 THEN 1 ELSE 0 END) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS dead
      FROM staged
    )
    SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, n_events,
           CAST(n_censored AS BIGINT) AS n_censored,
           CAST(CASE WHEN dead = 0 THEN cum_nano END AS VARCHAR)
             AS log_surv_nano,
           CASE WHEN dead = 1 THEN 0.0
                ELSE round(exp(CAST(cum_nano AS DOUBLE) / 1e9), 6)
           END AS surv_r6
    FROM scored
    """,
)
def q_kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime survival curve: per-customer lifetime = days
    between first and last order, churn event = no order within 90
    days of the dataset horizon (else right-censored — the customer
    may still be active). Kaplan-Meier with the log-space fixed-point
    product (operators/timeseries.py:kaplan_meier); `log_surv_nano`
    is the bit-exact surface, `surv_r6` the human-readable curve."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.timeseries import (
        kaplan_meier,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    percust = orders.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_d"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
    )
    horizon = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("maxd")
    )
    life = percust.crossJoin(F.broadcast(horizon)).select(
        F.datediff("last_d", "first_d").alias("t"),
        F.when(F.datediff("maxd", "last_d") > 90, 1)
        .otherwise(0)
        .alias("event"),
    )
    km = kaplan_meier(life)
    # driver-surface adaptation (the inverted_index_docs precedent): a
    # NULLABLE bigint comes back from DuckDB's pandas bridge as float64
    # and the driver's %.6g float canonicalization truncates nano-nat
    # integers — ship the exact digits as a string on both sides
    return km.withColumn(
        "log_surv_nano", F.col("log_surv_nano").cast("string")
    )




@register(
    "conformal_revenue_intervals",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS c
      FROM orders GROUP BY 1
    ), staged AS (
      SELECT d, c, lag(c, 7) OVER (ORDER BY d) AS pred_c FROM daily
    ), st AS (
      SELECT * FROM staged WHERE pred_c IS NOT NULL
    ), cal AS (
      SELECT abs(c - pred_c) AS score FROM st WHERE d < DATE '2000-01-01'
    ), ranked AS (
      SELECT score,
             row_number() OVER (ORDER BY score) AS rk,
             count(*) OVER () AS n_cal
      FROM cal
    ), qhat AS (
      SELECT score AS qhat_c FROM ranked
      WHERE rk = CAST(floor((90 * (n_cal + 1) + 99) / 100) AS BIGINT)
    )
    SELECT d, c / 100.0 AS value, pred_c / 100.0 AS pred,
           (pred_c - qhat_c) / 100.0 AS lower,
           (pred_c + qhat_c) / 100.0 AS upper,
           abs(c - pred_c) <= qhat_c AS covered
    FROM st CROSS JOIN qhat
    WHERE d >= DATE '2000-01-01'
    """,
)
def q_conformal_revenue_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90% split-conformal intervals around a 7-row seasonal-naive
    daily-revenue forecast: calibrate |error| before 2000-01-01, widen
    every later forecast by the exact conformal order statistic —
    distribution-free coverage, all integer cents
    (operators/timeseries.py:seasonal_naive_conformal)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.timeseries import (
        seasonal_naive_conformal,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    return seasonal_naive_conformal(daily)
