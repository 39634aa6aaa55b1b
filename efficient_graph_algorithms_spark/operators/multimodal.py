"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing here is REAL and tested — schemas, Arrow batch
shapes, ``mapInPandas`` partitioning, metadata propagation. The actual
media decode is STUBBED (image/audio libs are not in this container):
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``deterministic_fake=True``, in which case they produce seeded fake
features so the distributed pipeline is exercised end-to-end.

Pattern: media rows are large (MBs) — the operators keep batches small
via ``spark.sql.execution.arrow.maxRecordsPerBatch`` and never collect
binaries to the driver; feature extraction emits fixed-width
``array<float>`` columns that downstream similarity search consumes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)
FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decode: dims + features are a pure function of
    the payload bytes (so tests are stable under any partitioning)."""
    digest = hashlib.md5(payload).digest()
    w = 16 + digest[0] % 64
    h = 16 + digest[1] % 64
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    feats = np.resize(rng, FEATURE_DIM) / 255.0
    return w, h, feats


def decode_media(payload: bytes, kind: str, deterministic_fake: bool = False):
    """STUB: real decode needs PIL/ffmpeg/librosa — not in this container.
    The Spark plumbing around it is real; swap this function in prod."""
    if deterministic_fake:
        return _fake_decode(payload, kind)
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; pass deterministic_fake=True to exercise the pipeline"
    )


def extract_media_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """media(media_id, kind, payload binary) → FEATURES_SCHEMA rows via
    mapInPandas (Arrow batches; binaries never leave the executors)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, kind, payload in zip(b["media_id"], b["kind"], b["payload"]):
                data = bytes(payload)
                w, h, feats = decode_media(data, kind, deterministic_fake)
                rows.append((mid, kind, len(data), w, h, feats.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "width", "height", "features"]
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (decode stubbed the same way). Demonstrates the explode-style
    fan-out shape used for video at scale."""
    from pyspark.sql import functions as F

    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(10) * every_n, F.lit(every_n))).alias("frame_idx"),
    )
