"""Multimodal columns: opaque binary payloads + typed metadata.

Extensions beyond the reference surface (north star). Images/audio/video are
``binary`` columns with a metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. The decode kernels
themselves are STUBBED (no image/audio libraries in this container — clearly
marked below); the Spark-side plumbing — schema, batch iteration, partition
sizing — is real and tested with a deterministic fake decoder.

Scale notes: mapInPandas streams Arrow batches, so a 100 TB binary column
never materializes per-task; keep ``spark.sql.files.maxPartitionBytes`` at
128-256 MB so each task holds only a few batches of payloads.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
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

#: metadata struct carried alongside every media payload
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), False),  # image/audio/video
        StructField("format", StringType(), True),  # png/jpeg/wav/mp4…
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real implementation needs an image library (PIL/cv2), absent in
    this container. The deterministic fake below hashes the payload into a
    4×4 grayscale 'image' so the distributed plumbing is testable."""
    if payload is None:
        raise NotImplementedError("image decode requires PIL/cv2 (not installed)")
    rng = np.frombuffer(payload[:16].ljust(16, b"\0"), dtype=np.uint8)
    return np.tile(rng.reshape(4, 4).astype(np.float32), (1, 1))


def image_features(
    media: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode + feature-extract images as a mapInPandas stage.

    Feature = flattened mean-pooled grid of the (fake-)decoded image. Swap
    ``_decode_image`` for a real decoder in a container with PIL/cv2; the
    Spark-side shape (Arrow batches, schema, partitioning) is unchanged.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                img = _decode_image(row[payload_col])
                rows.append(
                    {
                        "doc_id": row[id_col],
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "features": img.mean(axis=0).astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "features"])

    return media.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(
    media: DataFrame,
    *,
    every_ms: int = 1000,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling stub: emits (doc_id, frame_ts_ms, frame binary).
    Real decoding requires ffmpeg/av (not installed) — the fake emits one
    deterministic pseudo-frame per ``every_ms`` of declared duration."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                duration = int(row.get("duration_ms") or 0)
                payload = row[payload_col] or b""
                for ts in range(0, max(duration, 1), every_ms):
                    out.append(
                        {
                            "doc_id": row[id_col],
                            "frame_ts_ms": ts,
                            "frame": bytes(payload[:8]) + ts.to_bytes(8, "big"),
                        }
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_ts_ms", "frame"])

    return media.mapInPandas(sample, schema=schema)


def image_resize(
    media: DataFrame,
    *,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image resize stub: re-encodes each payload as a (width, height)
    pseudo-image. Real implementation needs PIL/cv2 (not installed); the
    fake nearest-neighbor-samples the decoded fake grid so output shape and
    determinism are real."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                img = _decode_image(row[payload_col])
                ys = (np.arange(height) * img.shape[0] // height) % img.shape[0]
                xs = (np.arange(width) * img.shape[1] // width) % img.shape[1]
                resized = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "doc_id": row[id_col],
                        "width": width,
                        "height": height,
                        "payload": resized.astype(np.uint8).tobytes(),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "payload"])

    return media.mapInPandas(resize, schema=schema)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_windows", IntegerType(), False),
        StructField("energy", ArrayType(FloatType()), True),
    ]
)


def audio_features(
    media: DataFrame,
    *,
    window_ms: int = 1000,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Audio feature stub: per-window energy over the declared duration.
    Real decoding requires an audio library (soundfile/librosa — not
    installed); the fake derives deterministic energies from payload bytes
    so the Arrow plumbing and window arithmetic are testable."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                duration = int(row.get("duration_ms") or 0)
                payload = row[payload_col] or b"\0"
                n = max(1, duration // window_ms)
                buf = np.frombuffer(payload, dtype=np.uint8)
                energy = [
                    float(buf[i::n].astype(np.float64).mean()) if len(buf[i::n]) else 0.0
                    for i in range(n)
                ]
                rows.append(
                    {
                        "doc_id": row[id_col],
                        "n_windows": n,
                        "energy": np.asarray(energy, dtype=np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_windows", "energy"])

    return media.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)
