"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment — each stub either raises NotImplementedError or, with
deterministic_fake=True, produces a seeded deterministic result so the
Spark-side plumbing — schema, batching, partition flow — is fully
testable). The real integration point is one function per modality with
an Arrow batch in and out; swapping the stub for PIL/ffmpeg/torchaudio
changes no plan shape.

Schema convention:
  media(media_id long, kind string, payload binary, meta map<string,string>)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, MapType, StringType, StructField,
                               StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),     # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("meta", MapType(StringType(), StringType()), True),
])


def _fake_floats(payload: bytes, n: int, lo: float = -1.0, hi: float = 1.0) -> np.ndarray:
    """Deterministic pseudo-decode: bytes → seeded vector (stable across
    processes; stands in for a real decoder's output shape)."""
    digest = hashlib.blake2b(payload or b"", digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "little"))
    return rng.uniform(lo, hi, n).astype(np.float32)


# ---------------------------------------------------------------------------
# image: decode → (width, height, channels) + feature vector
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("features", ArrayType(FloatType()), True),
])


def image_features(df: DataFrame, feature_dim: int = 64,
                   deterministic_fake: bool = False) -> DataFrame:
    """mapInPandas over image rows → per-image feature vectors.

    Real implementation: PIL.Image.open(io.BytesIO(payload)) → resize →
    channel-mean pooling (or a model forward pass). STUB here."""

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            if not deterministic_fake:
                raise NotImplementedError(
                    "image decode requires an image library (PIL) not "
                    "present in this environment; pass "
                    "deterministic_fake=True to exercise the plumbing")
            rows = []
            for media_id, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                               pdf["meta"]):
                meta = meta or {}
                w = int(meta.get("width", 64))
                h = int(meta.get("height", 64))
                feats = _fake_floats(payload, feature_dim)
                rows.append((media_id, w, h, 3, feats.tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return (df.where(F.col("kind") == "image")
            .select("media_id", "payload", "meta")
            .mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA))


# ---------------------------------------------------------------------------
# audio: decode → duration + frame-level energy
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("sample_rate", IntegerType(), True),
    StructField("duration_s", FloatType(), True),
    StructField("frame_energy", ArrayType(FloatType()), True),
])


def audio_features(df: DataFrame, n_frames: int = 32,
                   deterministic_fake: bool = False) -> DataFrame:
    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            if not deterministic_fake:
                raise NotImplementedError(
                    "audio decode requires an audio library (soundfile/"
                    "ffmpeg); pass deterministic_fake=True for plumbing tests")
            rows = []
            for media_id, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                               pdf["meta"]):
                meta = meta or {}
                sr = int(meta.get("sample_rate", 16000))
                dur = float(len(payload or b"")) / sr
                energy = _fake_floats(payload, n_frames, 0.0, 1.0)
                rows.append((media_id, sr, dur, energy.tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_FEATURES_SCHEMA.fields])

    return (df.where(F.col("kind") == "audio")
            .select("media_id", "payload", "meta")
            .mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA))


# ---------------------------------------------------------------------------
# video: frame sampling → per-frame payload refs
# ---------------------------------------------------------------------------

VIDEO_FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("frame", BinaryType(), True),
])


def sample_video_frames(df: DataFrame, every_ms: int = 1000,
                        max_frames: int = 16,
                        deterministic_fake: bool = False) -> DataFrame:
    """One output row per sampled frame (explode shape — downstream image
    featurization reuses image_features on the frames)."""

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            if not deterministic_fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg; pass "
                    "deterministic_fake=True for plumbing tests")
            rows = []
            for media_id, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                               pdf["meta"]):
                meta = meta or {}
                dur_ms = int(meta.get("duration_ms", 4000))
                n = min(max_frames, max(1, dur_ms // every_ms))
                for i in range(n):
                    fake = hashlib.blake2b((payload or b"") + bytes([i]),
                                           digest_size=16).digest()
                    rows.append((media_id, i, i * every_ms, fake))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              VIDEO_FRAMES_SCHEMA.fields])

    return (df.where(F.col("kind") == "video")
            .select("media_id", "payload", "meta")
            .mapInPandas(kernel, schema=VIDEO_FRAMES_SCHEMA))
