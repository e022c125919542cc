"""Multimodal column plumbing: image/audio/video payloads as opaque binary
columns with typed metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side contract (schema, partition-preserving batched UDFs, bounded
batch sizes for large blobs) is real and tested; the actual codec step is
stubbed — image/audio libraries are not available in this environment, so
`decode` raises NotImplementedError unless `fake=True`, which derives a
deterministic pseudo-decode from the payload hash (stable across runs,
good enough to exercise every downstream stage).

At 100 TB: binary payloads dominate row size — `maxRecordsPerBatch` must be
set low for these pipelines (the session factory's 10k default is for scalar
rows; pass batch_size here), and metadata-only plans never touch the blob
column thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

_FEATURE_DIM = 8


def _fake_decode(payload: bytes) -> dict:
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 64,
        "height": 64 + h[1] % 64,
        "mean_pixel": h[2] / 255.0,
    }


def _fake_features(payload: bytes) -> list[float]:
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:_FEATURE_DIM]]


def decode_images(df: DataFrame, payload_col: str = "payload", fake: bool = False) -> DataFrame:
    """payload → (width, height, mean_pixel) columns. Real codecs would slot
    into `_decode` unchanged; the Spark plumbing is identical."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True for the "
            "deterministic hash-based pseudo-decoder"
        )
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("dec_width", T.IntegerType()),
            T.StructField("dec_height", T.IntegerType()),
            T.StructField("mean_pixel", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            pdf = pdf.copy()
            pdf["dec_width"] = [d["width"] for d in decoded]
            pdf["dec_height"] = [d["height"] for d in decoded]
            pdf["mean_pixel"] = [d["mean_pixel"] for d in decoded]
            yield pdf

    return df.mapInPandas(run, schema)


def extract_image_features(
    df: DataFrame, payload_col: str = "payload", fake: bool = False
) -> DataFrame:
    """payload → embedding array<float> (feeds the similarity operators)."""
    if not fake:
        raise NotImplementedError(
            "feature extractors unavailable in this environment; pass fake=True"
        )
    schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [_fake_features(bytes(p)) for p in pdf[payload_col]]
            yield pdf

    return df.mapInPandas(run, schema)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """payload → resized payload + (width, height) overwritten to the target.
    A real implementation decodes, resamples, and re-encodes inside the same
    mapInPandas batch loop; the fake path re-encodes deterministically as
    md5(payload || WxH) so downstream stages (dedup by payload hash, size
    filters) see a stable, size-annotated blob."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True"
        )
    if target_width <= 0 or target_height <= 0:
        raise ValueError("target dimensions must be positive")
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"{target_width}x{target_height}".encode()
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [
                hashlib.md5(bytes(p) + tag).digest() for p in pdf[payload_col]
            ]
            if "width" in pdf.columns:
                pdf["width"] = np.int32(target_width)
            if "height" in pdf.columns:
                pdf["height"] = np.int32(target_height)
            yield pdf

    return df.mapInPandas(run, schema)


def sample_video_frames(
    df: DataFrame, frames_col: str = "frames", every_n: int = 10
) -> DataFrame:
    """array<binary> frame lists → every Nth frame (pure Catalyst `filter` on
    the array index — no Python, no shuffle)."""
    from pyspark.sql import functions as F

    return df.withColumn(
        frames_col,
        F.filter(F.col(frames_col), lambda _, i: i % every_n == 0),
    )
