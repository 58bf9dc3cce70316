"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shapes, UDF
signatures) is real and tested; the actual media decoding is STUBBED because
the container ships no image/audio libraries — every stub is clearly marked
and raises NotImplementedError unless the deterministic fake is requested.

Pattern for 100 TB: media bytes live in their own column (parquet keeps them
out of unrelated scans via column pruning), metadata in a sibling struct;
decode / resize / frame-sample run as ``mapInPandas`` so one Arrow batch of
binaries is decoded per task without a per-row Python round trip.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source", T.StringType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("content_hash", T.StringType()),
])


def synth_media_table(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a media table from the documents fixture: text bytes stand in
    for encoded media so the binary-column plumbing is exercised for real."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit(f"{kind}/x-fake").alias("mime"),
            F.length(F.encode(F.col("text"), "utf-8")).cast("long")
            .alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(content: bytes) -> "object":
    """STUB: real implementation would use PIL/libvips.

    Raises: the container has no imaging libraries (see module docstring).
    """
    raise NotImplementedError(
        "image decoding requires PIL/libvips — not available in this "
        "container; use fake_decode_dims for deterministic plumbing tests"
    )


def fake_decode_dims(content: bytes) -> tuple:
    """Deterministic fake decoder: dimensions derived from the byte length
    (mirrorable in SQL: width = 64 + n_bytes % 64, height = 64 + n_bytes % 48)."""
    n = len(content or b"")
    return (64 + n % 64, 64 + n % 48, 3)


def extract_features(media: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch of binaries per task."""
    if not use_fake_decoder:
        # the real path would import the decoder here, per-executor
        decode_image(b"")  # raises NotImplementedError with guidance

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["content"].map(fake_decode_dims)
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(
                    lambda b: len(b) if b is not None else 0),
                "width": dims.map(lambda d: d[0]),
                "height": dims.map(lambda d: d[1]),
                "channels": dims.map(lambda d: d[2]),
                "content_hash": pdf["content"].map(
                    lambda b: hashlib.md5(b or b"").hexdigest()),
            })
            yield out

    return media.mapInPandas(per_batch, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 224,
                  height: int = 224, use_fake: bool = True) -> DataFrame:
    """Resize plumbing: mapInPandas batch shape is real, the resample STUB
    derives deterministic 'resized' bytes (truncate/pad to w*h proportional
    length) — a real deployment drops PIL.thumbnail into per_batch."""
    if not use_fake:
        decode_image(b"")  # raises NotImplementedError with guidance
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_SCHEMA["meta"].dataType),
    ])
    target = max(1, (width * height) // 1024)

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake_resize(b):
                b = b or b""
                return (b * (target // max(len(b), 1) + 1))[:target]

            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(fake_resize)
            yield pdf

    return media.mapInPandas(per_batch, schema=out_schema)


def audio_features(media: DataFrame, use_fake: bool = True) -> DataFrame:
    """Audio feature extraction STUB: duration/sample-rate derived
    deterministically from the byte stream (real path: soundfile/librosa)."""
    if not use_fake:
        raise NotImplementedError(
            "audio decoding requires soundfile/librosa — not in container")
    return media.select(
        "media_id",
        (F.length("content") / F.lit(16000.0)).alias("duration_s"),
        F.lit(16000).alias("sample_rate"),
        F.xxhash64("content").alias("content_sig"),
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 100,
                 frame_size: int = 16) -> DataFrame:
    """'Video' frame sampling stand-in: slice the byte stream at a fixed
    stride (the real operator would seek keyframes).  Pure JVM expressions —
    shows how per-frame rows explode out of one binary column."""
    n_frames = (F.length("content") / every_n_bytes).cast("int")
    return media.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: F.struct(
                    i.alias("frame_no"),
                    F.substring(F.col("content"), i * every_n_bytes + 1,
                                frame_size).alias("frame_bytes"),
                ),
            )
        ).alias("f"),
    ).select("media_id", "f.frame_no", "f.frame_bytes")
