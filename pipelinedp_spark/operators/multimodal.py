"""Multimodal (image/audio/video) column operators.

Design for 100 TB corpora: media is carried as opaque ``binary`` columns
with typed metadata structs alongside; all per-item compute runs in
Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row-at-a-time pickling, and each task processes a bounded batch
(``spark.sql.execution.arrow.maxRecordsPerBatch``) so executor memory is
bounded regardless of item size.

The actual codecs (PIL / torchaudio / ffmpeg) are NOT available in this
environment, so decoding is STUBBED: ``decoder="fake"`` (default) produces
deterministic content-derived stand-ins (byte-level statistics shaped like
the real decoder's output) and ``decoder="pil"``-style real backends raise
NotImplementedError until their import succeeds. The Spark-side plumbing —
schemas, UDF signatures, batch iteration, partitioning — is real and
tested, so swapping in a real decoder is a one-function change.

No reference counterpart (net-new per project north star).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

IMAGE_META_SCHEMA = StructType([
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("format", StringType()),
])

AUDIO_META_SCHEMA = StructType([
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("codec", StringType()),
])


def _require_real_decoder(name: str):
    raise NotImplementedError(
        f"real {name} decoding requires a media library that is not "
        f"installed in this environment; use decoder='fake' for the "
        f"deterministic stand-in, or install the library and extend "
        f"_decode_batch")


def _fake_pixel_stats(data: bytes, n_bins: int = 16) -> np.ndarray:
    """Deterministic stand-in for decoded-pixel statistics: the normalized
    byte-value histogram of the payload. Shaped like a real luminance
    histogram so downstream feature code exercises realistic plumbing."""
    if data is None or len(data) == 0:
        return np.zeros(n_bins)
    arr = np.frombuffer(data, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
    return hist / max(len(arr), 1)


def decode_images(df: DataFrame, binary_col: str = "image",
                  decoder: str = "fake",
                  feature_bins: int = 16) -> DataFrame:
    """binary payload -> (all input columns, features array<double>,
    content_hash string). Arrow-batched mapInPandas; the fake decoder emits
    byte-histogram features, a real decoder would emit pixel features with
    the same signature."""
    if decoder != "fake":
        _require_real_decoder("image")
    out_schema = StructType(
        df.schema.fields +
        [StructField("features", ArrayType(DoubleType())),
         StructField("content_hash", StringType())])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[binary_col]
            pdf = pdf.copy()
            pdf["features"] = [
                _fake_pixel_stats(b, feature_bins).tolist() for b in payloads]
            pdf["content_hash"] = [
                hashlib.md5(b or b"").hexdigest() for b in payloads]
            yield pdf

    return df.mapInPandas(batches, out_schema)


def resize_images(df: DataFrame, binary_col: str = "image",
                  meta_col: str = "meta", width: int = 224,
                  height: int = 224, decoder: str = "fake") -> DataFrame:
    """Stub resize: real backends re-encode pixels; the fake backend keeps
    the payload and rewrites the metadata struct (schema plumbing is what
    downstream code depends on)."""
    if decoder != "fake":
        _require_real_decoder("image")
    return df.withColumn(
        meta_col,
        F.struct(F.lit(width).alias("width"), F.lit(height).alias("height"),
                 F.col(f"{meta_col}.format").alias("format")))


def sample_video_frames(df: DataFrame, frames_col: str = "frames",
                        every_nth: int = 10,
                        max_frames: Optional[int] = None) -> DataFrame:
    """Frame sampling over array<binary> frame columns — pure column
    expressions (no Python): take every nth frame, optionally capped."""
    idx = F.sequence(F.lit(0), F.size(frames_col) - 1, F.lit(every_nth))
    sampled = F.transform(idx, lambda i: F.element_at(F.col(frames_col),
                                                      i + 1))
    if max_frames is not None:
        sampled = F.slice(sampled, 1, max_frames)
    return df.withColumn(frames_col, sampled)


def extract_audio_features(df: DataFrame, binary_col: str = "audio",
                           meta_col: Optional[str] = None,
                           decoder: str = "fake",
                           n_bins: int = 8) -> DataFrame:
    """binary waveform payload -> (.., audio_features array<double>,
    est_duration_s double). Fake decoder: byte-histogram features and a
    size-based duration estimate (real: spectral features + exact
    duration); identical signature either way."""
    if decoder != "fake":
        _require_real_decoder("audio")
    out_schema = StructType(
        df.schema.fields +
        [StructField("audio_features", ArrayType(DoubleType())),
         StructField("est_duration_s", DoubleType())])
    has_meta = meta_col is not None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["audio_features"] = [
                _fake_pixel_stats(b, n_bins).tolist()
                for b in pdf[binary_col]]
            if has_meta:
                rates = [m["sample_rate"] if m else 16000
                         for m in pdf[meta_col]]
                counts = [m["n_samples"] if m else len(b or b"") // 2
                          for m, b in zip(pdf[meta_col], pdf[binary_col])]
                pdf["est_duration_s"] = [
                    c / max(r, 1) for c, r in zip(counts, rates)]
            else:
                # 16-bit mono @16kHz assumption for the stand-in.
                pdf["est_duration_s"] = [
                    len(b or b"") / 2.0 / 16000.0 for b in pdf[binary_col]]
            yield pdf

    return df.mapInPandas(batches, out_schema)


def dedup_by_content_hash(df: DataFrame, binary_col: str = "image",
                          id_col: str = "doc_id") -> DataFrame:
    """Exact media dedup: md5 over the payload bytes, one hash-groupBy
    (native, no Python) — same shape as text exact_dedup."""
    return (df.select(F.col(id_col), F.md5(F.col(binary_col)).alias("hash"))
            .groupBy("hash")
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count"))
            .select(id_col, "hash", "dup_count"))
