"""Registry queries: multimodal family. Split from queries.py
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
    "multimodal_features",
    oracle="""
    WITH m AS (
      SELECT CAST(i AS BIGINT) AS media_id,
             ['image','audio','video'][CAST(i % 3 AS INT) + 1] AS kind,
             repeat(sha256(CAST(i AS VARCHAR)), 4) AS payload
      FROM range(0, 200) t(i)
    )
    SELECT media_id, kind,
           CAST(length(payload) AS BIGINT) AS payload_bytes,
           substr(sha256(payload), 1, 32) AS feature_hex
    FROM m
    """,
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media feature extraction over the binary payload
    column (deterministic stub decoder; real Spark plumbing).

    The operator returns ``feature array<double>``; the *registered*
    query serializes it to a hex digest column so the driver's
    canonicalizer (sorts/hashes scalar cells) can check it, and so the
    sha256-deterministic stub is DuckDB-oracle-expressible: each feature
    element is ``byte/255.0`` of the payload digest, so mapping elements
    back to bytes and hex-concatenating reproduces
    ``substr(sha256(payload), 1, 32)`` exactly."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    feats = extract_features(synthesize_media(spark, n=200))
    byte_hex = lambda x: F.lpad(
        F.lower(F.hex(F.round(x * 255).cast("int"))), 2, "0"
    )
    return feats.select(
        "media_id",
        "kind",
        "payload_bytes",
        F.concat_ws("", F.transform("feature", byte_hex)).alias("feature_hex"),
    )




@register(
    "multimodal_resize",
    oracle="""
    WITH m AS (
      SELECT CAST(i AS BIGINT) AS media_id,
             repeat(sha256(CAST(i AS VARCHAR)), 4) AS payload
      FROM range(0, 200) t(i) WHERE i % 3 = 0
    )
    SELECT media_id, 'image/x-fake-thumbnail' AS mime,
           8 AS width, 8 AS height,
           repeat(sha256(payload), 2) AS thumb_hex
    FROM m
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize_images plumbing (Arrow mapInPandas over image payloads,
    fixed 8×8 = 64-byte thumbnails) with the binary serialized to hex
    for the driver's canonicalizer. The stub thumbnail is the payload
    digest cycled to size — 64 bytes = exactly two sha256 digests, so
    the oracle is ``repeat(sha256(payload), 2)``."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.multimodal import (
        resize_images,
        synthesize_media,
    )

    thumbs = resize_images(synthesize_media(spark, n=200), width=8, height=8)
    return thumbs.select(
        "media_id",
        "mime",
        "width",
        "height",
        F.lower(F.hex("thumbnail")).alias("thumb_hex"),
    )




@register(
    "multimodal_frame_plan",
    oracle="""
    WITH m AS (
      SELECT CAST(i AS BIGINT) AS media_id, CAST(i * 33 AS BIGINT) AS duration_ms
      FROM range(0, 200) t(i) WHERE i % 3 = 2
    ), f AS (
      SELECT media_id, duration_ms,
             unnest(generate_series(0, greatest(duration_ms - 1, 0), 1000))
               AS frame_ts_ms
      FROM m
    )
    SELECT media_id, duration_ms,
           CAST(frame_ts_ms // 1000 AS INT) AS frame_idx,
           CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms
    FROM f
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: posexplode over a timestamp sequence
    derived from duration — row multiplicity handled by the engine, the
    per-frame decode stays in the (stubbed) UDF. Fully deterministic →
    DuckDB generate_series mirror."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.multimodal import (
        frame_sample_plan,
        synthesize_media,
    )

    return frame_sample_plan(synthesize_media(spark, n=200), every_ms=1000)




@register(
    "multimodal_audio_windows",
    oracle="""
    WITH m AS (
      SELECT CAST(i AS BIGINT) AS media_id, CAST(i * 33 AS BIGINT) AS duration_ms
      FROM range(0, 200) t(i) WHERE i % 3 = 1
    ), sized AS (
      SELECT media_id, duration_ms,
             CASE WHEN duration_ms >= 25
                  THEN (duration_ms - 25) // 10 + 1 ELSE 0 END AS n_win
      FROM m
    ), w AS (
      SELECT media_id, duration_ms,
             unnest(generate_series(0, n_win - 1)) AS window_idx
      FROM sized WHERE n_win > 0
    )
    SELECT media_id, duration_ms, window_idx,
           window_idx * 10 AS start_ms,
           window_idx * 10 + 25 AS end_ms,
           CAST((window_idx * 10 * 16000) / 1000 AS BIGINT) AS start_sample,
           CAST(400 AS BIGINT) AS n_samples
    FROM w
    """,
)
def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature-window grid (25 ms windows / 10 ms hop at 16 kHz —
    the standard speech STFT layout) over the synthetic media table:
    per-clip overlapping windows with millisecond AND sample offsets,
    all integer arithmetic (operators/multimodal.py:audio_window_plan).
    Row multiplicity is real Spark; the per-window DSP stays in the
    stubbed decode seam."""
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.multimodal import (
        audio_window_plan,
        synthesize_media,
    )

    return audio_window_plan(synthesize_media(spark, n=200))




@register(
    "media_ahash_pairs",
    oracle="""
    SELECT a.i AS id_a, b.i AS id_b, 0 AS hamming
    FROM range(0, 400) a(i) JOIN range(0, 400) b(i)
      ON a.i % 80 = b.i % 80 AND a.i < b.i
    """,
)
def q_media_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs via perceptual hashing: 400 synthetic media
    payloads (80 distinct images, 5 copies each — payload derived from
    id%80 like synthesize_media), aHash over the stub-decoded 8×8
    thumbnail (operators/multimodal.py:ahash_media), pairs via the SAME
    banded Hamming join text SimHash uses
    (operators/dedup.py:hamming_pairs). Copies of one image hash
    identically (distance 0); the oracle is the exact id%80 pair set —
    a cross-group aHash collision within radius 3 would break the hash
    (P ≈ 4·10⁻¹⁵ per pair), so this checks candidate completeness AND
    precision of the banding machinery over a binary media column."""
    from pyspark.sql import functions as F

    from dea05_e2e_kafka_streaming_pipeline_spark.operators.dedup import (
        hamming_pairs,
    )
    from dea05_e2e_kafka_streaming_pipeline_spark.operators.multimodal import (
        ahash_media,
    )

    media = spark.range(400).select(
        F.col("id").alias("media_id"),
        F.encode(
            F.repeat(F.sha2((F.col("id") % 80).cast("string"), 256), 4), "utf-8"
        ).alias("payload"),
    )
    sigs = ahash_media(media).select("media_id", "ahash")
    return hamming_pairs(
        sigs, id_col="media_id", hash_col="ahash", max_hamming=3
    )
