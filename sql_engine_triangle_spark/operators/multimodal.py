"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed with Arrow-batched mapInPandas.

The container has no image/audio codecs, so the DECODE step is
explicitly stubbed (``decode_image`` raises NotImplementedError; the
metadata extractor uses a clearly-marked deterministic fake for
width/height). Everything Spark-side is real and tested: the binary
schema, the mapInPandas batch iteration, the output schema contract,
and partition-parallel execution.

At 100 TB: binary payloads ride in their own column so column pruning
skips them unless a stage needs bytes; metadata-only queries never
read the blobs (Parquet columnar projection).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def decode_image(content: bytes) -> "object":
    """STUB: real image decode requires a codec library not present
    in this container. The Spark-side plumbing treats payloads as
    opaque bytes; swap this for PIL/torchvision decode in a real
    deployment."""
    raise NotImplementedError(
        "image decoding is stubbed in this environment; "
        "metadata extraction uses extract_asset_metadata instead"
    )


def docs_as_assets(docs: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal asset table: text
    payload encoded to an opaque binary column + media type tag.
    (Real deployments read image/audio bytes the same way — an opaque
    binary column with typed metadata alongside.)"""
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


def extract_asset_metadata(assets: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction over the binary column.

    n_bytes is real (len of the payload). width/height are a
    DETERMINISTIC FAKE standing in for decoded dimensions
    (width = n_bytes % 1024, height = (n_bytes * 7) % 768) so the
    batch plumbing is oracle-checkable without codecs.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["content"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    # FAKE decode stand-in — see docstring.
                    "width": (n_bytes % 1024).astype("int32"),
                    "height": ((n_bytes * 7) % 768).astype("int32"),
                }
            )

    return assets.mapInPandas(extract, META_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    STAND-IN KERNEL: a real deployment would run an image/audio
    encoder here; this environment has no codecs, so the feature is a
    deterministic byte-histogram projection (numpy, Arrow-batched) —
    the batch shape, schema contract (array<float>), and partition
    parallelism are exactly what a real encoder UDF uses.
    """
    import numpy as np

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).astype(np.float32).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "feature": feats})

    return assets.mapInPandas(feat, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling over "video" payloads via mapInPandas: emit
    n_frames evenly-spaced byte slices per asset (1 row in → N rows
    out — the fan-out shape of real frame extraction). The slicing is
    the deterministic stand-in for an actual video decoder."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "n_bytes": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(b)
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    chunk = raw[i * step : (i + 1) * step]
                    if not chunk:
                        break
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(chunk)
                    out["n_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return assets.mapInPandas(frames, FRAME_SCHEMA)
