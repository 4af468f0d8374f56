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
    "hll_estimates",
    "hll_hash",
    "hll_merge",
    "hll_partials",
    "kmv_pair_overlap",
    "kmv_sketch",
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
    # LEFT join + coalesce(cnt, 0): a candidate token whose bucket was
    # never incremented (true count 0 — normal when callers pass
    # external query tokens not drawn from the corpus) must contribute
    # a 0 counter to the min, not lose the row (which would inflate the
    # estimate) or vanish from the output entirely.
    return (
        fan.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("tok")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
        )
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


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog — re-aggregatable distinct-count registers
# ---------------------------------------------------------------------------
#
# Unlike ``approx_count_distinct`` (Spark's private HLL++, opaque and
# engine-specific), these registers derive ENTIRELY from md5, so the
# sketch state itself — not just "is the estimate close" — is
# reproducible in any engine and therefore hash-checkable against a
# DuckDB oracle. The long-form ``(key, reg_idx, reg_rho)`` layout is
# the mergeable partial: max() over any grouping of the same rows
# yields the same registers, which is what makes the structure safe to
# pre-aggregate per day/partition at 100 TB and roll up later to ANY
# coarser grain without rescanning raw data (the DataSketches
# warehouse pattern). Flajolet et al. 2007 for the estimator; the
# m<128 alpha constants are the paper's.

_HLL_HASH_BITS = 60  # 15 md5 hex chars — exact in a signed 64-bit int


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_hash(value: Column) -> Column:
    """60-bit hash: first 15 md5 hex chars of the value's string form.
    DuckDB mirror: ``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, 15), 16, 10
    ).cast("long")


def hll_partials(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    p: int = 6,
) -> DataFrame:
    """Per-key HLL register table: ``keys + (reg_idx, reg_rho)``.

    ``reg_idx`` = low ``p`` hash bits; ``reg_rho`` = position of the
    first 1-bit in the remaining ``60-p`` bits (``w+1`` if all zero),
    computed exactly from the binary-string length (``bin()`` exists
    and is minimal-width in both Spark and DuckDB) — no floating log,
    so the registers are bit-exact across engines.

    ONE aggregation pass; map-side combine collapses each partition to
    ≤ ``2^p`` rows per key before the shuffle, so shuffle volume is
    bounded by sketch size × partitions, independent of row count.
    """
    m = 1 << p
    w = _HLL_HASH_BITS - p
    hv = hll_hash(F.col(value_col))
    # arithmetic shift == floor-div for the non-negative 60-bit hash;
    # a double `/` here would round above 2^53
    q = F.shiftright(hv, p)
    rho = F.when(q == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.bin(q)) + 1
    )
    return (
        df.select(
            *keys,
            (hv % m).cast("int").alias("reg_idx"),
            rho.cast("int").alias("reg_rho"),
        )
        .groupBy(*keys, "reg_idx")
        .agg(F.max("reg_rho").alias("reg_rho"))
    )


def hll_merge(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Roll partial registers up to a coarser key set — max() per
    register. Exactly the sketch that ``hll_partials`` would have built
    from the union of the underlying rows (max is associative), so
    pre-aggregated sketches compose without touching raw data."""
    return partials.groupBy(*keys, "reg_idx").agg(
        F.max("reg_rho").alias("reg_rho")
    )


def hll_estimates(partials: DataFrame, keys: list[str], p: int = 6) -> DataFrame:
    """Cardinality estimates from a register table.

    The indicator sum Z = Σ 2^-rho is kept as an EXACT scaled integer
    (``z_scaled`` = Z · 2^(w+1), every term a power of two ≤ 2^w, so a
    64-bit sum is exact) and the raw estimate is ONE double division of
    that integer — deterministic across engines. The linear-counting
    branch (E ≤ 2.5m with empty registers — the regime every small
    group sits in) uses ln(), rounded to 4 decimals like every other
    ln-bearing surface in this repo.
    """
    m = 1 << p
    w = _HLL_HASH_BITS - p
    # alpha·m²·2^(w+1) precomputed in Python and inlined as ONE double
    # literal so Spark and DuckDB divide identical numerators
    numerator = _hll_alpha(m) * m * m * float(1 << (w + 1))
    term = F.expr(f"CAST(power(2, {w + 1} - reg_rho) AS BIGINT)")
    agg = partials.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("regs_used"),
        F.sum(term).alias("present_sum"),
    )
    zeros = F.lit(m) - F.col("regs_used")
    z_scaled = zeros * F.lit(1 << (w + 1)) + F.col("present_sum")
    e_raw = F.lit(numerator) / z_scaled.cast("double")
    est = F.when(
        (e_raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *keys,
        F.col("regs_used"),
        zeros.cast("long").alias("zero_regs"),
        z_scaled.cast("long").alias("z_scaled"),
        F.round(est, 4).alias("est_distinct_r4"),
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch — distinct-set OVERLAP estimation
# ---------------------------------------------------------------------------
#
# HLL answers |A|; it cannot answer |A ∩ B| (union via max-merge, yes;
# intersection, no). The k-minimum-values / theta sketch (Beyer et al.
# 2007; the DataSketches theta family) does: keep the k smallest
# hashes per set; for two sets, theta = the k-th smallest of the
# union, and every retained hash below theta is a uniform sample of
# the union, so |A ∩ B| ≈ (matching hashes below theta) / theta. Same
# md5-determinism as the HLL above: the retained-hash sets, theta, and
# every estimate are bit-reproducible in DuckDB.


def kmv_sketch(
    df: DataFrame, key_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-key KMV sketch: the ``k`` smallest distinct 60-bit hashes of
    ``value_col`` → rows ``(key, hv, rk)`` with ``rk`` the 1-based rank.

    The distinct-(key, hv) pre-reduction is the volume bound: the
    ranking window sees one row per distinct value, never per raw row,
    and map-side combine caps each partition's contribution at its own
    distinct count. (At truly unbounded per-key cardinality the window
    would be replaced by a two-phase partial top-k — per-partition
    k-smallest first — which changes no output; SCALE.md.)"""
    from pyspark.sql import Window

    hv = hll_hash(F.col(value_col))
    distinct = (
        df.select(F.col(key_col).alias("key"), hv.alias("hv")).distinct()
    )
    w = Window.partitionBy("key").orderBy("hv")
    return (
        distinct.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("key", "hv", "rk")
    )


def kmv_pair_overlap(sketch: DataFrame, k: int = 64) -> DataFrame:
    """All-pairs set-overlap estimates from per-key KMV sketches.

    For each unordered key pair: merge the two retained-hash sets,
    dedup (equal values hash equally), rank; theta = the k-th smallest
    merged hash. If the merged set holds fewer than k hashes the
    sketches ARE the sets (exact mode — theta spans the whole hash
    space). Estimates are single double divisions of exact integers,
    rounded to 4 decimals.

    The pair fan-out is |keys|² sketch joins of ≤ k rows each —
    sketch-sized work, independent of raw data volume, which is the
    entire point at 100 TB: overlap questions get answered from KBs of
    sketch state, not by re-joining base tables.
    """
    from pyspark.sql import Window

    space = float(1 << _HLL_HASH_BITS)
    # the sketch is referenced three times below (key enumeration + both
    # membership sides); a DataFrame re-derives its lineage per
    # reference, and the lineage here is typically the FULL distinct+
    # window pipeline over raw values — pin it (lazy localCheckpoint:
    # computed once at action time, zero jobs at plan-build, nothing
    # persists across runs) so the pair stage reads k·|keys| pinned rows
    # instead of recomputing the sketch build thrice
    sketch = sketch.localCheckpoint(eager=False)
    # unordered key pairs — |keys|² rows, broadcast onto the sketches
    keys = sketch.select("key").distinct()
    kp = (
        keys.select(F.col("key").alias("key_a"))
        .crossJoin(keys.select(F.col("key").alias("key_b")))
        .filter(F.col("key_a") < F.col("key_b"))
    )
    # union of the two retained-hash sets per pair, with membership flags
    left = (
        F.broadcast(kp)
        .join(sketch.select(F.col("key").alias("key_a"), "hv"), "key_a")
        .select("key_a", "key_b", "hv", F.lit(1).alias("fa"), F.lit(0).alias("fb"))
    )
    right = (
        F.broadcast(kp)
        .join(sketch.select(F.col("key").alias("key_b"), "hv"), "key_b")
        .select("key_a", "key_b", "hv", F.lit(0).alias("fa"), F.lit(1).alias("fb"))
    )
    u = (
        left.unionByName(right)
        .groupBy("key_a", "key_b", "hv")
        .agg(F.max("fa").alias("fa"), F.max("fb").alias("fb"))
    )
    w = Window.partitionBy("key_a", "key_b").orderBy("hv")
    ranked = u.withColumn("rk", F.row_number().over(w))
    stats = ranked.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.max(F.when(F.col("rk") == k, F.col("hv"))).alias("theta"),
        F.sum(
            F.when((F.col("fa") == 1) & (F.col("fb") == 1) & (F.col("rk") < k), 1)
            .otherwise(0)
        ).alias("common_below"),
        F.sum(
            F.when((F.col("fa") == 1) & (F.col("fb") == 1), 1).otherwise(0)
        ).alias("common_all"),
    )
    exact_mode = F.col("n_merged") < k
    est_union = F.when(exact_mode, F.col("n_merged").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(space) / F.col("theta").cast("double")
    )
    est_inter = F.when(exact_mode, F.col("common_all").cast("double")).otherwise(
        F.col("common_below").cast("double")
        * F.lit(space)
        / F.col("theta").cast("double")
    )
    return stats.select(
        "key_a",
        "key_b",
        "n_merged",
        F.col("theta"),
        F.round(est_union, 4).alias("est_union_r4"),
        F.round(est_inter, 4).alias("est_inter_r4"),
    )


def _bloom_pos(key: Column, i: Column | int, m_bits: int) -> Column:
    """Bit position of hash ``i`` for ``key``: md5-prefix bucket —
    deterministic and engine-portable like every sketch here."""
    ic = F.lit(i) if isinstance(i, int) else i
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", key.cast("string"), ic.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a ``m_bits/32``-row
    WORD TABLE: each key sets ``k`` md5-derived bits; words fold with
    ``bit_or`` (map-side combinable, commutative — partials from any
    partitioning merge to the same filter, the same algebra as the HLL
    register store). The result is broadcast-sized state for semijoin
    pre-filtering: ship the words to the fact-scan side and drop rows
    whose keys cannot be members BEFORE the shuffle — the manual form
    of the runtime bloom pushdown Spark injects, but persistable and
    shareable across queries/days like the other sketch tables.

    One-sided error by construction: a member key always finds all its
    bits set (no false negatives — audited as an output column of the
    registry query); non-members collide with probability
    ≈ (1 − e^{−kn/m})^k.
    """
    pos = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        F.col(key_col).alias("__key"),
    ).select(_bloom_pos(F.col("__key"), F.col("i"), m_bits).alias("p"))
    # 32-bit words in a BIGINT: shifts stay < 32, so the word value is
    # always positive — portable to engines that reject 1<<63 overflow
    return (
        pos.groupBy((F.col("p") / 32).cast("long").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(cast(1 as bigint), cast(p % 32 as int))")
            ).alias("bits")
        )
    )


def bloom_probe(
    probes: DataFrame,
    bloom_words: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Probe keys against a :func:`bloom_build` word table: a key is a
    possible member iff ALL ``k`` of its bits are set. The probe
    explodes each key into its k positions, broadcast-joins the tiny
    word table, and counts set bits per key — adds ``bloom_maybe``
    (boolean) to the probe rows. At 100 TB this runs INSIDE the scan
    stage of the big side (explode + broadcast join + filter), which is
    the whole point: non-member rows never reach a shuffle.
    """
    pos = probes.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
    ).select(
        key_col,
        _bloom_pos(F.col(key_col), F.col("i"), m_bits).alias("p"),
    )
    checked = (
        pos.withColumn("word_idx", (F.col("p") / 32).cast("long"))
        .join(F.broadcast(bloom_words), "word_idx", "left")
        .select(
            key_col,
            F.when(
                F.expr("(bits >> cast(p % 32 as int)) & 1").cast("long") == 1,
                1,
            )
            .otherwise(0)
            .alias("__hit"),
        )
    )
    flags = checked.groupBy(key_col).agg(
        (F.sum("__hit") == k).alias("bloom_maybe")
    )
    # LEFT join + coalesce(false): a NULL probe key never equi-joins,
    # so an inner join would make such rows disappear instead of
    # surfacing bloom_maybe = false (a NULL key was never inserted).
    return probes.join(flags, key_col, "left").withColumn(
        "bloom_maybe", F.coalesce(F.col("bloom_maybe"), F.lit(False))
    )
