"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata.

The container has no codec libraries, so the decode kernels are STUBS: a
clearly-marked deterministic fake (seeded from the payload bytes) stands in
for the real pixel/sample decode, gated behind an import-try for pillow /
soundfile when they exist. Everything Spark-side is real and tested:

* schema: ``media(media_id, kind, payload binary, meta struct<...>)``
* batched decode / feature-extract / resize / frame-sample as
  ``mapInPandas`` kernels (Arrow batches in, Arrow batches out — the shape
  a real decoder plugs into);
* partition sizing by payload bytes (media rows are fat: repartition by
  target batch size so one Arrow batch of payloads fits executor memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)

try:  # pragma: no cover - not installed in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-pixels derived from the payload
    hash. Replaces a real codec in environments without PIL/ffmpeg; the
    downstream plumbing (shapes, batching, schema) is identical."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "big") % (2**31)
    rng = np.random.RandomState(seed)
    return rng.rand(n).astype(np.float32)


def image_features(dim: int = 64):
    """mapInPandas kernel: (media rows) → (media_id, feature array<float>).

    Real decoders drop in by replacing ``_fake_decode`` with
    PIL → np.asarray → pooling; the Arrow batch shape stays the same.
    """
    out_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_PIL:  # pragma: no cover
                raise NotImplementedError("real PIL decode wired here")
            feats = [
                _fake_decode(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return kernel, out_schema


def frame_sample(n_frames_out: int = 4, frame_dim: int = 16):
    """mapInPandas kernel: video rows → one row per sampled frame with a
    deterministic stride over meta.n_frames."""
    out_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", ArrayType(FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                total = (meta or {}).get("n_frames") or n_frames_out
                stride = max(total // n_frames_out, 1)
                for j in range(min(n_frames_out, total)):
                    fi = j * stride
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(
                        _fake_decode((payload or b"") + fi.to_bytes(4, "big"), frame_dim).tolist()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return kernel, out_schema


def audio_features(n_mfcc: int = 16):
    """mapInPandas kernel: audio rows → (media_id, sr, duration_s, mfcc
    array<float>). The sample decode is the same clearly-marked deterministic
    stub as images (no soundfile/librosa in this container); the Spark-side
    contract — meta.sample_rate driving a duration estimate, fixed-width
    feature vector per row — is the shape a real audio frontend plugs into.
    """
    out_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("sample_rate", IntegerType()),
            StructField("duration_s", FloatType()),
            StructField("mfcc", ArrayType(FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srs, durs, feats = [], [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                sr = (meta or {}).get("sample_rate") or 16000
                n_bytes = len(payload or b"")
                # stub contract: payload = 16-bit PCM mono at meta.sample_rate
                dur = (n_bytes / 2) / sr
                ids.append(mid)
                srs.append(sr)
                durs.append(np.float32(dur))
                feats.append(_fake_decode(payload, n_mfcc).tolist())
            yield pd.DataFrame(
                {"media_id": ids, "sample_rate": srs, "duration_s": durs, "mfcc": feats}
            )

    return kernel, out_schema


def extract_audio_features(media: DataFrame, n_mfcc: int = 16) -> DataFrame:
    kernel, schema = audio_features(n_mfcc)
    return media.where(F.col("kind") == "audio").mapInPandas(kernel, schema)


def extract_image_features(media: DataFrame, dim: int = 64, rows_per_batch: int = 64) -> DataFrame:
    """Feature extraction over image rows; payload-heavy rows get small
    Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch should be
    sized so batch_bytes ≈ rows_per_batch × avg payload)."""
    kernel, schema = image_features(dim)
    return media.where(F.col("kind") == "image").mapInPandas(kernel, schema)


def sample_video_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    kernel, schema = frame_sample(n_frames)
    return media.where(F.col("kind") == "video").mapInPandas(kernel, schema)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests (payload = hash bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        meta = {
            "width": 32 + (i % 8) * 16 if kind == "image" else None,
            "height": 32 + (i % 5) * 16 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 12 + i % 7 if kind == "video" else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
        }
        rows.append((f"m{i:04d}", kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
