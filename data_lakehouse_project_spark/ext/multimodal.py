"""Multimodal column handling (SURVEY §2.8).

Media (image/audio/video) are opaque ``binary`` columns paired with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` stages so Python cost is per-batch, not per-row, and the
pipeline around them (partitioning, schema, pushdown on metadata) stays
native Spark.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic STUB (``_decode_stub``); the Spark-side
plumbing — schema contract, batch iteration, partition sizing — is real
and tested. Swap ``_decode_stub`` for PIL/libav in production.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("mime", StringType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha256", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded bytes)."""
    rows = []
    for i in range(n):
        blob = hashlib.sha256(str(i).encode()).digest() * 8  # 256 bytes
        mtype = ("image", "audio", "video")[i % 3]
        rows.append((i, mtype, bytearray(blob), 16, 16, 1000 + i, f"x/{mtype}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(content: bytes, media_type: str) -> list[float]:
    """STUB decode kernel — deterministic 8-dim feature from raw bytes.

    Production replaces this with a real decoder (PIL / torchaudio /
    pyav). Raising ``NotImplementedError`` here would be honest too, but a
    deterministic fake lets the distributed plumbing be exercised in CI.
    sha256 (not sha1) so an external SQL oracle can recompute the
    fingerprint and the per-byte features bit-for-bit.
    """
    h = hashlib.sha256(content).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize media via Arrow-batched ``mapInPandas``.

    Plan shape at scale: the binary column never shuffles — featurization
    is map-side; downstream ops keep only the small feature vector. Filter
    on metadata BEFORE this stage so pushdown prunes undecodable rows.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_sha256": pdf["content"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": [
                        _decode_stub(bytes(c), t)
                        for c, t in zip(pdf["content"], pdf["media_type"])
                    ],
                }
            )
            yield out

    return df.mapInPandas(_batches, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand (media_id, duration) into frame
    timestamps JVM-side (sequence+explode); actual frame decode would join
    this plan against the binary column inside mapInPandas. Keeps the
    explode (cheap, no payload) separate from decode (expensive, map-only).
    """
    return (
        df.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


RESIZED_SCHEMA = (
    "media_id long, media_type string, out_w int, out_h int, "
    "content binary, n_bytes long"
)


def resize_images(df: DataFrame, width: int, height: int,
                  batch_hint: int = 1024) -> DataFrame:
    """Image resize over Arrow batches (mapInPandas). The pixel kernel is
    a STUB (no image codecs in this container): it deterministically
    resamples the RAW BYTES to width*height*3 via stride-sampling, which
    preserves the real plumbing — binary in/binary out, per-batch Arrow
    transfer, stable output schema with size metadata — so swapping in a
    PIL/libvips kernel changes one inner function, not the operator.
    Non-image rows pass through untouched metadata-wise (content kept,
    out_w/out_h null) so the operator is safe mid-pipeline.
    """
    import numpy as np

    target = width * height * 3

    def _resize_bytes(b: bytes) -> bytes:
        src = np.frombuffer(b, dtype=np.uint8)
        if len(src) == 0:
            return bytes(target)
        idx = (np.arange(target) * len(src) // target) % len(src)
        return src[idx].tobytes()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            is_img = pdf["media_type"] == "image"
            content = [
                _resize_bytes(c) if img else c
                for c, img in zip(pdf["content"], is_img)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "out_w": [width if i else None for i in is_img],
                    "out_h": [height if i else None for i in is_img],
                    "content": content,
                    "n_bytes": [len(c) for c in content],
                }
            )

    return df.mapInPandas(_batches, RESIZED_SCHEMA)
