"""Registry queries: sketches family. Split from queries.py
(r4 verdict item 2); registration order within the family preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dea05_e2e_kafka_streaming_pipeline_spark.queries._registry import (  # noqa: F401
    register,
)
from dea05_e2e_kafka_streaming_pipeline_spark.queries._shared import *  # noqa: F401,F403




@register("cms_heavy_hitters", oracle=_cms_oracle(16, 3, 500))
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (width 16 × depth 3, threshold
    500): the sketch builds in one bounded aggregate pass (≤ 48
    counters regardless of corpus size) and broadcasts back for the
    estimate join. The deliberately small width forces bucket
    collisions, so the min-over-rows estimate logic is actually
    exercised, not vacuous. md5-derived buckets make the whole pipeline
    DuckDB-reproducible — a hash-matched row, rare for sketches."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        cms_heavy_hitters,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    return cms_heavy_hitters(docs, threshold=500, width=16, depth=3)




@register(
    "hll_register_sketch",
    oracle=(
        "WITH "
        + _hll_oracle_core(
            8,
            "SELECT c_nationkey, c_custkey AS v FROM customer",
            "c_nationkey",
        )
        + "\nSELECT c_nationkey, reg_idx, reg_rho FROM hr"
    ),
)
def q_hll_register_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable distinct-count PARTIAL itself, as data: per-nation
    HLL registers (p=8, m=256) over customer keys. At 100 TB this table
    is what lands in the warehouse — KBs per key per day, re-aggregatable
    to any coarser grain with max() and never rescanning raw rows. The
    registers are md5-derived, so DuckDB reproduces the sketch state
    bit-for-bit (contrast `approx_user_reach`, whose engine-private
    HLL++ can only be rows-only)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        hll_partials,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    cust = load_table(spark, sf_dir, "customer")
    return hll_partials(cust, ["c_nationkey"], "c_custkey", p=8)




@register(
    "hll_region_reach",
    oracle=(
        "WITH "
        + _hll_oracle_core(
            6,
            "SELECT n.n_regionkey, c.c_custkey AS v FROM customer c "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey",
            "n_regionkey",
        )
        + ","
        + _hll_oracle_estimate(6, "n_regionkey")
        + """,
    ex AS (
      SELECT n.n_regionkey, count(DISTINCT c.c_custkey) AS exact_distinct
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT he.n_regionkey, he.regs_used, he.zero_regs, he.z_scaled,
           he.est_distinct_r4, ex.exact_distinct,
           round(abs(he.est_distinct_r4 - ex.exact_distinct)
                 / ex.exact_distinct, 4) AS rel_err_r4
    FROM he JOIN ex ON he.n_regionkey = ex.n_regionkey
    """
    ),
)
def q_hll_region_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ROLLUP, end to end: nation-grain HLL partials (p=6)
    max-merged up to region — the register table the merge produces is
    provably identical to sketching regions directly (max is
    associative; the oracle sketches at region grain and the hashes
    must still match) — then estimated, with the exact distinct and
    relative error alongside. The nation→region attach is a broadcast
    of the 25-row dim onto a ≤ m-rows-per-nation sketch table, not onto
    raw customers."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        hll_estimates,
        hll_merge,
        hll_partials,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
    )
    parts = hll_partials(cust, ["c_nationkey"], "c_custkey", p=6)
    merged = hll_merge(
        parts.join(F.broadcast(nation), "c_nationkey"), ["n_regionkey"]
    )
    est = hll_estimates(merged, ["n_regionkey"], p=6)
    exact = (
        cust.join(F.broadcast(nation), "c_nationkey")
        .groupBy("n_regionkey")
        .agg(F.countDistinct("c_custkey").alias("exact_distinct"))
    )
    return est.join(exact, "n_regionkey").select(
        "n_regionkey",
        "regs_used",
        "zero_regs",
        "z_scaled",
        "est_distinct_r4",
        "exact_distinct",
        F.round(
            F.abs(F.col("est_distinct_r4") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err_r4"),
    )




@register(
    "hll_event_reach_raw",
    oracle=(
        "WITH "
        + _hll_oracle_core(
            4,
            "SELECT event_type, user_id AS v FROM events",
            "event_type",
        )
        + ","
        + _hll_oracle_estimate(4, "event_type")
        + "\nSELECT event_type, regs_used, zero_regs, z_scaled,"
        "\n       est_distinct_r4 FROM he"
    ),
)
def q_hll_event_reach_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-m sketch (p=4, m=16) over per-event-type user reach —
    sized so the cardinality exceeds 2.5m and the estimator takes the
    RAW harmonic-mean branch, pinning the power-of-two indicator sum
    and the single double division cross-engine (the linear-counting
    branch is exercised by `hll_region_reach`)."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        hll_estimates,
        hll_partials,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    parts = hll_partials(events, ["event_type"], "user_id", p=4)
    return hll_estimates(parts, ["event_type"], p=4)




@register(
    "kmv_user_overlap",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type AS key,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM events
    ), sk AS (
      SELECT key, hv,
             row_number() OVER (PARTITION BY key ORDER BY hv) AS rk
      FROM d QUALIFY rk <= {_KMV_K}
    ), kp AS (
      SELECT a.key AS key_a, b.key AS key_b
      FROM (SELECT DISTINCT key FROM sk) a, (SELECT DISTINCT key FROM sk) b
      WHERE a.key < b.key
    ), u AS (
      SELECT key_a, key_b, hv, max(fa) AS fa, max(fb) AS fb FROM (
        SELECT kp.key_a, kp.key_b, s.hv, 1 AS fa, 0 AS fb
        FROM kp JOIN sk s ON s.key = kp.key_a
        UNION ALL
        SELECT kp.key_a, kp.key_b, s.hv, 0 AS fa, 1 AS fb
        FROM kp JOIN sk s ON s.key = kp.key_b
      ) GROUP BY 1, 2, 3
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY key_a, key_b ORDER BY hv) AS rk
      FROM u
    ), st AS (
      SELECT key_a, key_b, count(*) AS n_merged,
             max(CASE WHEN rk = {_KMV_K} THEN hv END) AS theta,
             sum(CASE WHEN fa = 1 AND fb = 1 AND rk < {_KMV_K} THEN 1 ELSE 0 END)
               AS common_below,
             sum(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END) AS common_all
      FROM r GROUP BY 1, 2
    ), ex AS (
      SELECT a.event_type AS key_a, b.event_type AS key_b,
             count(*) AS exact_inter
      FROM (SELECT DISTINCT event_type, user_id FROM events) a
      JOIN (SELECT DISTINCT event_type, user_id FROM events) b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT st.key_a, st.key_b, st.n_merged, st.theta,
           round(CASE WHEN st.n_merged < {_KMV_K} THEN CAST(st.n_merged AS DOUBLE)
                 ELSE {float(_KMV_K - 1)} * {_KMV_SPACE} / CAST(st.theta AS DOUBLE)
                 END, 4) AS est_union_r4,
           round(CASE WHEN st.n_merged < {_KMV_K} THEN CAST(st.common_all AS DOUBLE)
                 ELSE CAST(st.common_below AS DOUBLE) * {_KMV_SPACE}
                      / CAST(st.theta AS DOUBLE)
                 END, 4) AS est_inter_r4,
           COALESCE(ex.exact_inter, 0) AS exact_inter
    FROM st LEFT JOIN ex
      ON st.key_a = ex.key_a AND st.key_b = ex.key_b
    """,
)
def q_kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-audience OVERLAP between every pair of event types from
    KMV/theta sketches (operators/sketches.py:kmv_sketch) — the
    question HLL structurally cannot answer (sketch intersection).
    k=64 smallest md5 hashes per type; theta = k-th smallest of each
    merged pair; common hashes below theta, scaled by 1/theta, estimate
    the intersection. Every retained hash, theta, and estimate is
    md5-deterministic, so the whole sketch pipeline hash-matches the
    DuckDB oracle; the exact intersection (distinct-pair self-join)
    rides along for honesty. At 100 TB the pair stage touches only
    sketch rows (k per key), never the base table."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        kmv_pair_overlap,
        kmv_sketch,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(events, "event_type", "user_id", k=_KMV_K)
    est = kmv_pair_overlap(sk, k=_KMV_K)
    exact = (
        events.select("event_type", "user_id")
        .distinct()
        .alias("a")
        .join(
            events.select("event_type", "user_id").distinct().alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("key_a"),
            F.col("b.event_type").alias("key_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    return est.join(exact, ["key_a", "key_b"], "left").select(
        "key_a",
        "key_b",
        "n_merged",
        "theta",
        "est_union_r4",
        "est_inter_r4",
        F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
    )




@register(
    "bloom_customer_membership",
    oracle="""
    WITH mem AS (SELECT DISTINCT o_custkey AS key FROM orders),
    pos AS (
      SELECT CAST('0x' || substr(md5(CAST(key AS VARCHAR) || ':'
                                  || CAST(i AS VARCHAR)), 1, 8)
                  AS BIGINT) % 8192 AS p
      FROM mem, (VALUES (0), (1), (2)) t(i)
    ), words AS (
      SELECT p // 32 AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
      FROM pos GROUP BY 1
    ), probes AS (
      SELECT c_custkey AS key FROM customer
      UNION ALL
      SELECT c_custkey + 10000000 AS key FROM customer
    ), cpos AS (
      SELECT key,
             CAST('0x' || substr(md5(CAST(key AS VARCHAR) || ':'
                                  || CAST(i AS VARCHAR)), 1, 8)
                  AS BIGINT) % 8192 AS p
      FROM probes, (VALUES (0), (1), (2)) t(i)
    ), hits AS (
      SELECT cp.key,
             SUM(CASE WHEN ((w.bits >> CAST(cp.p % 32 AS INT)) & 1) = 1
                      THEN 1 ELSE 0 END) AS nbits
      FROM cpos cp LEFT JOIN words w ON w.word_idx = cp.p // 32
      GROUP BY cp.key
    ), lab AS (
      SELECT h.key, (h.nbits = 3) AS maybe, (m.key IS NOT NULL) AS actual
      FROM hits h LEFT JOIN mem m ON h.key = m.key
    )
    SELECT count(*) AS n_probes,
           CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
             AS n_maybe,
           CAST(SUM(CASE WHEN maybe AND NOT actual THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN actual AND NOT maybe THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_neg,
           round(CAST(SUM(CASE WHEN maybe AND NOT actual THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / CAST(SUM(CASE WHEN NOT actual THEN 1 ELSE 0 END)
                        AS DOUBLE), 6) AS fpr_r6
    FROM lab
    """,
)
def q_bloom_customer_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semijoin audit: build an 8192-bit / 3-hash filter
    over the distinct ordering customers, probe EVERY customer, and
    report the confusion counts — n_false_neg is structurally 0 (the
    one-sided-error contract, hash-checked) and fpr_r6 measures the
    collision rate against the (1-e^{-kn/m})^k economics. Every
    customer orders in this corpus, so shifted keys (+10^7) supply the
    guaranteed non-member probes. The filter itself is a 128-row
    broadcastable word table (32-bit words in BIGINTs keep every
    shift portable)."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    members = orders.select(F.col("o_custkey").alias("key")).distinct()
    words = bloom_build(members, "key", m_bits=8192, k=3)
    probes = customer.select(F.col("c_custkey").alias("key")).unionByName(
        customer.select((F.col("c_custkey") + 10000000).alias("key"))
    )
    probed = bloom_probe(probes, words, "key", m_bits=8192, k=3)
    labeled = probed.join(
        members.withColumn("__m", F.lit(1)), "key", "left"
    ).select(
        "bloom_maybe", F.coalesce("__m", F.lit(0)).cast("boolean").alias("actual")
    )
    maybe = F.col("bloom_maybe")
    actual = F.col("actual")
    return labeled.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(actual.cast("int")).cast("long").alias("n_members"),
        F.sum(maybe.cast("int")).cast("long").alias("n_maybe"),
        F.sum((maybe & ~actual).cast("int")).cast("long").alias("n_false_pos"),
        F.sum((actual & ~maybe).cast("int")).cast("long").alias("n_false_neg"),
        F.round(
            F.sum((maybe & ~actual).cast("int")).cast("double")
            / F.sum((~actual).cast("int")).cast("double"),
            6,
        ).alias("fpr_r6"),
    )


@register(
    "kmv_source_shingle_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents
    ), sh AS (
      SELECT source,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
      FROM t
    ), d AS (
      SELECT DISTINCT source AS key,
             ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS hv
      FROM sh
    ), sk AS (
      SELECT key, hv,
             row_number() OVER (PARTITION BY key ORDER BY hv) AS rk
      FROM d QUALIFY rk <= {_KMV_K}
    ), kp AS (
      SELECT a.key AS key_a, b.key AS key_b
      FROM (SELECT DISTINCT key FROM sk) a, (SELECT DISTINCT key FROM sk) b
      WHERE a.key < b.key
    ), u AS (
      SELECT key_a, key_b, hv, max(fa) AS fa, max(fb) AS fb FROM (
        SELECT kp.key_a, kp.key_b, s.hv, 1 AS fa, 0 AS fb
        FROM kp JOIN sk s ON s.key = kp.key_a
        UNION ALL
        SELECT kp.key_a, kp.key_b, s.hv, 0 AS fa, 1 AS fb
        FROM kp JOIN sk s ON s.key = kp.key_b
      ) GROUP BY 1, 2, 3
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY key_a, key_b ORDER BY hv) AS rk
      FROM u
    ), st AS (
      SELECT key_a, key_b, count(*) AS n_merged,
             max(CASE WHEN rk = {_KMV_K} THEN hv END) AS theta,
             sum(CASE WHEN fa = 1 AND fb = 1 AND rk < {_KMV_K} THEN 1 ELSE 0 END)
               AS common_below,
             sum(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END) AS common_all
      FROM r GROUP BY 1, 2
    ), ds AS (
      SELECT DISTINCT source, shingle FROM sh
    ), ex AS (
      SELECT a.source AS key_a, b.source AS key_b, count(*) AS exact_inter
      FROM ds a JOIN ds b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT st.key_a, st.key_b, st.n_merged, st.theta,
           round(CASE WHEN st.n_merged < {_KMV_K} THEN CAST(st.n_merged AS DOUBLE)
                 ELSE {float(_KMV_K - 1)} * {_KMV_SPACE} / CAST(st.theta AS DOUBLE)
                 END, 4) AS est_union_r4,
           round(CASE WHEN st.n_merged < {_KMV_K} THEN CAST(st.common_all AS DOUBLE)
                 ELSE CAST(st.common_below AS DOUBLE) * {_KMV_SPACE}
                      / CAST(st.theta AS DOUBLE)
                 END, 4) AS est_inter_r4,
           COALESCE(ex.exact_inter, 0) AS exact_inter
    FROM st LEFT JOIN ex
      ON st.key_a = ex.key_a AND st.key_b = ex.key_b
    """,
)
def q_kmv_source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE shingle-vocabulary overlap from KMV/theta sketches:
    which crawl sources share 3-gram content, answered at sketch cost
    (k=64 retained hashes per source) instead of the pair-join cost of
    `source_contamination_matrix` — the one-pass mergeable path a
    100 TB corpus survey must take (per-source sketches reduce
    map-side; the pair stage touches k·|sources| rows total, never
    the corpus). Same estimator as `kmv_user_overlap`; the exact
    distinct-shingle intersection rides along for honesty at oracle
    scale (it, not the sketch, is what a scale deployment would drop).
    Composes operators/sketches.py:kmv_sketch over
    operators/text.py:word_shingles."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        kmv_pair_overlap,
        kmv_sketch,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
        word_shingles,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "source", F.explode(word_shingles("text")).alias("shingle")
    )
    # distinct (source, shingle) is computed ONCE and pinned (lazy
    # localCheckpoint): the sketch build and the exact-intersection
    # audit both derive from it, and un-pinned each reference re-ran
    # the whole shingle explode + string distinct (the query's
    # dominant cost) from the parquet scan
    ds = sh.distinct().localCheckpoint(eager=False)
    sk = kmv_sketch(ds, "source", "shingle", k=_KMV_K)
    est = kmv_pair_overlap(sk, k=_KMV_K)
    # the exact audit joins on the 60-bit shingle hash, not the string:
    # rows are distinct (source, shingle) so equal-hash rows across two
    # sources are exactly the shared distinct shingles (modulo the same
    # accepted ~n²/2⁶⁰ collision risk the whole shingle-hash family
    # carries) — 8-byte join keys instead of shuffling shingle strings
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
        hll_hash,
    )

    dsv = ds.select("source", hll_hash(F.col("shingle")).alias("hv"))
    exact = (
        dsv.alias("a")
        .join(
            dsv.alias("b"),
            (F.col("a.hv") == F.col("b.hv"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("key_a"),
            F.col("b.source").alias("key_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    return est.join(exact, ["key_a", "key_b"], "left").select(
        "key_a",
        "key_b",
        "n_merged",
        "theta",
        "est_union_r4",
        "est_inter_r4",
        F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
    )
