"""Multimodal column support — image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is real and tested: schemas, batch
iteration, partition sizing, UDF signatures. The actual media decode is
STUBBED (``decoder="fake"`` produces deterministic synthetic output;
``decoder="real"`` raises ``NotImplementedError``) because no
image/audio libraries exist in this container — swapping the stub for a
Pillow/ffmpeg call changes one function body, none of the plumbing.

Design rules for the 100 TB path baked in here:

- media bytes ride in ONE binary column; metadata (width/height/codec/
  duration) are ordinary typed columns so filters on them push down and
  never touch the payload.
- decode/feature-extract runs in ``mapInPandas`` so each Arrow batch
  amortizes Python crossing; ``spark.sql.execution.arrow.maxRecordsPerBatch``
  and input split size bound batch memory.
- outputs are fixed-width (feature vectors / thumbnails with declared
  schema), never re-inflated media, so downstream stages are columnar.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_FIELDS = "media_id long, kind string, feature array<double>, payload_bytes long"


def synthesize_media(spark, n: int = 100, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table (binary payload = repeated digest
    of the id) for exercising the plumbing end-to-end in tests."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    payload = F.repeat(F.sha2(F.col("id").cast("string"), 256), payload_bytes // 64)
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        (F.col("id") % 640 + 1).cast("int").alias("width"),
        (F.col("id") % 480 + 1).cast("int").alias("height"),
        (F.col("id") * 33).alias("duration_ms"),
        F.encode(payload, "utf-8").alias("payload"),
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic FEATURE_DIM-dim vector from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def extract_features(
    df: DataFrame,
    decoder: str = "fake",
) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched mapInPandas.

    ``decoder="real"`` is the integration point for an actual media
    stack; it raises NotImplementedError here by design (no media libs
    in this environment).
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":  # pragma: no cover - env has no media libs
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "present in this environment; use decoder='fake'"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": pdf["payload"].map(_fake_feature),
                    "payload_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                }
            )

    return df.mapInPandas(run, schema=_FEATURES_FIELDS)


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    decoder: str = "fake",
) -> DataFrame:
    """Image resize through the same Arrow-batched plumbing as
    :func:`extract_features`: fixed-size thumbnail payload out, metadata
    updated. ``decoder="fake"`` emits a deterministic digest-derived
    payload of exactly width*height bytes; ``decoder="real"`` is the
    Pillow integration point (NotImplementedError here — no image libs
    in this environment)."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")
    out_schema = (
        "media_id long, mime string, width int, height int, thumbnail binary"
    )
    n_bytes = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":  # pragma: no cover - env has no media libs
                raise NotImplementedError(
                    "real image resize requires Pillow/ffmpeg; use decoder='fake'"
                )
            def thumb(p: bytes | None) -> bytes:
                d = hashlib.sha256(p or b"").digest()
                reps = n_bytes // len(d) + 1
                return (d * reps)[:n_bytes]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": "image/x-fake-thumbnail",
                    "width": width,
                    "height": height,
                    "thumbnail": pdf["payload"].map(thumb),
                }
            )

    return df.filter(df["kind"] == "image").mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (video, frame
    timestamp) — the explode is real Spark (posexplode over a sequence
    of timestamps derived from duration); the frame decode itself is the
    stubbed step. This is the shape a video pipeline needs: row
    multiplicity handled by the engine, byte work in the UDF."""
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(every_ms).cast("long"),
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "duration_ms", F.posexplode(frames).alias("frame_idx", "frame_ts_ms"))
    )


def audio_window_plan(
    df: DataFrame,
    sample_rate: int = 16_000,
    win_ms: int = 25,
    hop_ms: int = 10,
) -> DataFrame:
    """Audio feature-window *plan* (the STFT/fbank windowing grid): one
    row per (audio, overlapping window) with millisecond and SAMPLE
    offsets — ``win_ms`` window, ``hop_ms`` hop, the standard speech
    25/10 default. Like :func:`frame_sample_plan`, the row multiplicity
    is real Spark (posexplode over an integer sequence bounded by the
    duration — pure integer arithmetic, engine-exact); the per-window
    decode/FFT is the stubbed UDF step. Clips shorter than one window
    yield zero rows."""
    n_windows = F.when(
        F.col("duration_ms") >= win_ms,
        (F.col("duration_ms") - win_ms) / hop_ms + 1,
    ).otherwise(F.lit(0)).cast("long")
    idx = F.sequence(F.lit(0).cast("long"), n_windows - 1)
    out = (
        df.filter((F.col("kind") == "audio") & (n_windows > 0))
        .select(
            "media_id",
            "duration_ms",
            F.posexplode(idx).alias("window_idx", "_i"),
        )
        .drop("_i")
    )
    start_ms = F.col("window_idx") * hop_ms
    return out.select(
        "media_id",
        "duration_ms",
        "window_idx",
        start_ms.alias("start_ms"),
        (start_ms + win_ms).alias("end_ms"),
        (start_ms * sample_rate / 1000).cast("long").alias("start_sample"),
        F.lit(win_ms * sample_rate // 1000).cast("long").alias("n_samples"),
    )


def ahash_media(
    df,
    payload_col: str = "payload",
    decoder: str = "fake",
    out_col: str = "ahash",
):
    """64-bit average-hash (aHash) per media row — the perceptual
    fingerprint behind image near-dup detection: decode → 8×8 grayscale
    thumbnail → bit i = (pixel i > mean). Near-identical images differ
    in a few bits, so pairing runs through the SAME banded Hamming join
    as text SimHash (``operators/dedup.py:hamming_pairs``) — one
    machinery for both modalities.

    ``decoder="fake"`` derives the 64 thumbnail bytes from the payload
    digest exactly like ``resize_images`` (no media libs in this
    container; reference-point docstring there); ``decoder="real"`` is
    the documented integration seam. Arrow-batched scalar UDF; NULL
    payloads get a NULL hash (excluded from pairing)."""
    import hashlib

    import numpy as np
    import pandas as pd

    if decoder == "real":
        raise NotImplementedError(
            "real image decode needs PIL/opencv — not in this container; "
            "the fake decoder exercises identical Spark plumbing"
        )

    def ah(ps):
        out = []
        for p in ps:
            if p is None:
                out.append(None)
                continue
            d = hashlib.sha256(bytes(p)).digest()
            thumb = (d * (64 // len(d) + 1))[:64]
            arr = np.frombuffer(thumb, dtype=np.uint8)
            bits = arr > arr.mean()
            acc = np.uint64(0)
            for i, b in enumerate(bits):
                if b:
                    acc |= np.uint64(1) << np.uint64(i)
            out.append(int(acc.astype(np.int64)))  # two's-complement wrap
        return pd.Series(out, dtype="object")

    ah.__annotations__ = {"ps": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(ah, "long")
    return df.withColumn(out_col, udf(F.col(payload_col)))
