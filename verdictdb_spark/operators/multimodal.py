"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata and
implements decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.  The actual codec calls are
STUBBED (no image/audio libs in this container): by default they
raise ``NotImplementedError``; with ``fake=True`` they produce
deterministic hash-derived outputs so the Spark-side plumbing —
schema, batching, partitioning, UDF signatures — is real and tested.

Swap ``_decode_image_real`` etc. for PIL/ffmpeg calls in production;
nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("data", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _fake_u64(data: pd.Series) -> np.ndarray:
    """Deterministic per-blob pseudo-hash (first 8 bytes xor length)."""
    out = np.empty(len(data), dtype=np.uint64)
    for i, b in enumerate(data):
        head = int.from_bytes((bytes(b)[:8] or b"\0").ljust(8, b"\0"), "little")
        out[i] = np.uint64(head) ^ np.uint64(len(b))
    return out


def _decode_image_real(blob: bytes):
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this container; "
        "use fake=True for plumbing tests"
    )


IMAGE_INFO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_images(df: DataFrame, fake: bool = False) -> DataFrame:
    """binary -> (width, height, channels, mean_pixel) per image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                for b in pdf["data"]:
                    _decode_image_real(b)  # raises
            h = _fake_u64(pdf["data"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": (16 + (h % np.uint64(1024))).astype(np.int32),
                    "height": (16 + ((h >> np.uint64(10)) % np.uint64(1024))).astype(np.int32),
                    "channels": np.full(len(pdf), 3, dtype=np.int32),
                    "mean_pixel": ((h >> np.uint64(20)) % np.uint64(256)).astype(np.float64),
                }
            )

    return df.where(F.col("modality") == "image").select("media_id", "data").mapInPandas(
        run, IMAGE_INFO_SCHEMA
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 64, fake: bool = False) -> DataFrame:
    """binary -> dense feature vector (stubbed model forward pass).

    The fake path derives a deterministic unit vector from the blob
    hash — stable across runs, so downstream similarity-search tests
    have a real contract to hold on to.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                for b in pdf["data"]:
                    _decode_image_real(b)
            h = _fake_u64(pdf["data"])
            rngmat = np.empty((len(pdf), dim), dtype=np.float32)
            for i, seed in enumerate(h):
                rngmat[i] = np.random.default_rng(int(seed)).standard_normal(dim)
            norms = np.linalg.norm(rngmat, axis=1, keepdims=True)
            norms[norms == 0] = 1
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": list(rngmat / norms)}
            )

    return df.select("media_id", "data").mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4, fake: bool = False) -> DataFrame:
    """video binary -> n deterministic evenly-spaced 'frames' (byte
    slices in the stub; ffmpeg keyframes in production).  One row per
    frame — the standard explode shape for frame-level pipelines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                for b in pdf["data"]:
                    _decode_image_real(b)
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(blob)
                step = max(len(blob) // n_frames, 1)
                for j in range(n_frames):
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(blob[j * step : (j + 1) * step] or b"\0")
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.where(F.col("modality") == "video").select("media_id", "data").mapInPandas(
        run, FRAME_SCHEMA
    )


def synthetic_media(spark, rows: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    return (
        spark.range(rows)
        .select(
            F.col("id").alias("media_id"),
            F.when(F.col("id") % 3 == 0, "image")
            .when(F.col("id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("modality"),
            F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 512)
            .cast("binary")
            .alias("data"),
            F.create_map(F.lit("src"), F.lit("synthetic")).alias("meta"),
        )
    )
