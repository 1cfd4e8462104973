"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested (schemas, Arrow batch shape,
``mapInPandas`` partition flow, metadata propagation); the actual
codec work is STUBBED — image/audio libraries are not available in
this environment. Each decode function either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
derived from the bytes (test mode), so pipelines exercise the exact
same distributed execution path they would with a real codec.

At 100 TB: binary payloads stay in parquet/Iceberg binary columns;
``mapInPandas`` streams Arrow record batches through the extractor so
no executor ever holds a partition's blobs fully decoded; pair with
``spark.sql.files.maxPartitionBytes`` sized to blob width.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               StringType, StructField, StructType)

IMAGE_META_SCHEMA = StructType([
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("format", StringType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("features", ArrayType(FloatType())),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def attach_fake_binary(df: DataFrame, id_col: str, payload_bytes: int = 64,
                       out_col: str = "payload") -> DataFrame:
    """Deterministic binary column for testing the multimodal plumbing
    (sha2-derived bytes, repeatable across runs/partitionings)."""
    hex_str = F.sha2(F.col(id_col).cast("string"), 256)
    repeated = F.substring(F.repeat(hex_str, (payload_bytes // 32) + 1),
                           1, payload_bytes * 2)
    return df.withColumn(out_col, F.unhex(repeated).cast(BinaryType()))


def _fake_decode(payload: bytes, feature_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode + embed: bytes →
    fixed-dim float features. Replace with (e.g.) PIL + a vision model
    in production — signature and batch shape stay identical."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big") % (2 ** 31)
    rng = np.random.RandomState(seed)
    return rng.standard_normal(feature_dim).astype("float32")


def extract_image_features(df: DataFrame, id_col: str = "doc_id",
                           binary_col: str = "payload",
                           feature_dim: int = 16,
                           strict: bool = False) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).
    ``strict=True`` raises NotImplementedError where a real codec would
    run — marking the stub boundary explicitly."""
    out_schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("features", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image decode requires PIL/torchvision — not "
                    "available in this environment")
            feats = [
                None if b is None else _fake_decode(bytes(b), feature_dim)
                for b in pdf[binary_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "features": [None if f is None else f.tolist() for f in feats],
                "n_bytes": [0 if b is None else len(b)
                            for b in pdf[binary_col]],
            })

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def sample_video_frames(df: DataFrame, id_col: str = "doc_id",
                        binary_col: str = "payload", every_n: int = 10,
                        strict: bool = False) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.
    The decode itself is stubbed (deterministic frame count from byte
    length)."""
    out_schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real video decode requires ffmpeg/av — not available")
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                n_frames = 0 if b is None else max(1, len(b) // 16)
                for fi in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(None if b is None
                                  else bytes(b)[fi % len(b):fi % len(b) + 4])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame_bytes": frames})

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)
