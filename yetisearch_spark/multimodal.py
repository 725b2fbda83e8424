"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Decode paths are REAL where the environment allows a dependency-free
decoder:
  * image — PNG (pure numpy + stdlib zlib, all five filters) and BMP via
    imagecodec.py; features = grayscale grid-mean pooling.
  * audio — WAV via stdlib ``wave`` + numpy PCM; features = per-bucket
    RMS energy.
  * video — a frame-offset container (meta["frame_offsets"] indexes
    encoded frames inside the payload, the shape ffmpeg-extracted
    keyframe tables produce); each sampled frame round-trips through the
    image path. Codec-compressed video would need ffmpeg — that single
    kernel is the only remaining stub.

``deterministic_fake=True`` keeps the seeded pseudo-decode for plumbing
tests and for payloads in formats without a built-in decoder. Rows that
fail to decode surface NULL columns rather than failing the job (bulk
pipelines quarantine, not crash).

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

    Real path: decode PNG/BMP payloads (imagecodec.py), grid-mean-pool
    grayscale features (√feature_dim × √feature_dim grid). Undecodable
    payloads yield NULL columns."""
    grid = max(1, int(round(feature_dim ** 0.5)))

    def kernel(batches):
        from .imagecodec import decode_image, grid_features
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for media_id, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                               pdf["meta"]):
                if deterministic_fake:
                    meta = meta or {}
                    w = int(meta.get("width", 64))
                    h = int(meta.get("height", 64))
                    feats = _fake_floats(payload, feature_dim)
                    rows.append((media_id, w, h, 3, feats.tolist()))
                    continue
                try:
                    img = decode_image(bytes(payload or b""))
                    feats = grid_features(img, grid)
                    ch = img.shape[2] if img.ndim == 3 else 1
                    rows.append((media_id, int(img.shape[1]),
                                 int(img.shape[0]), int(ch), feats.tolist()))
                except Exception:
                    rows.append((media_id, None, None, None, None))
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


def _decode_wav(payload: bytes, n_frames: int):
    """WAV → (sample_rate, duration_s, per-bucket RMS energy), stdlib-only."""
    import io
    import wave
    with wave.open(io.BytesIO(payload)) as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                   - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    dur = float(n) / sr if sr else 0.0
    if samples.size == 0:
        return sr, dur, [0.0] * n_frames
    bounds = np.linspace(0, samples.size, n_frames + 1).astype(int)
    energy = [float(np.sqrt(np.mean(samples[a:max(b, a + 1)] ** 2)))
              for a, b in zip(bounds[:-1], bounds[1:])]
    return sr, dur, energy


def audio_features(df: DataFrame, n_frames: int = 32,
                   deterministic_fake: bool = False) -> DataFrame:
    """Real path: WAV PCM decode via stdlib ``wave`` → sample rate,
    duration, per-bucket RMS energy. Non-WAV payloads yield NULLs."""

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for media_id, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                               pdf["meta"]):
                if deterministic_fake:
                    meta = meta or {}
                    sr = int(meta.get("sample_rate", 16000))
                    dur = float(len(payload or b"")) / sr
                    energy = _fake_floats(payload, n_frames, 0.0, 1.0)
                    rows.append((media_id, sr, dur, energy.tolist()))
                    continue
                try:
                    sr, dur, energy = _decode_wav(bytes(payload or b""),
                                                  n_frames)
                    rows.append((media_id, sr, float(dur),
                                 [float(e) for e in energy]))
                except Exception:
                    rows.append((media_id, None, None, None))
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
    featurization reuses image_features on the frames).

    Real path: the payload is a frame container indexed by
    meta["frame_offsets"] = "o0,o1,…" (byte offsets of encoded frames,
    the table an ffmpeg keyframe extraction produces) with optional
    meta["frame_ts_ms"]. Frames are sliced out at the requested sampling
    interval; each slice is a real encoded image for image_features.
    Codec-compressed video without an offset table needs ffmpeg — those
    rows yield no frames (or use deterministic_fake for plumbing)."""

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for media_id, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                               pdf["meta"]):
                meta = meta or {}
                if deterministic_fake:
                    dur_ms = int(meta.get("duration_ms", 4000))
                    n = min(max_frames, max(1, dur_ms // every_ms))
                    for i in range(n):
                        fake = hashlib.blake2b((payload or b"") + bytes([i]),
                                               digest_size=16).digest()
                        rows.append((media_id, i, i * every_ms, fake))
                    continue
                offs_s = meta.get("frame_offsets")
                if not offs_s:
                    continue  # no offset table and no ffmpeg → quarantine
                offsets = [int(x) for x in offs_s.split(",") if x != ""]
                ts_s = meta.get("frame_ts_ms")
                ts = ([int(x) for x in ts_s.split(",")] if ts_s
                      else [i * every_ms for i in range(len(offsets))])
                payload = bytes(payload or b"")
                bounds = offsets + [len(payload)]
                emitted = 0
                next_ts = 0
                for i, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
                    if emitted >= max_frames:
                        break
                    if ts[i] < next_ts:
                        continue  # sample at every_ms granularity
                    rows.append((media_id, i, ts[i], payload[a:b]))
                    emitted += 1
                    next_ts = ts[i] + every_ms
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              VIDEO_FRAMES_SCHEMA.fields])

    return (df.where(F.col("kind") == "video")
            .select("media_id", "payload", "meta")
            .mapInPandas(kernel, schema=VIDEO_FRAMES_SCHEMA))
