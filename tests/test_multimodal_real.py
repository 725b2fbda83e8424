"""Real multimodal decode: pure-numpy PNG/BMP, stdlib WAV, frame-offset
video containers — no image/audio libraries, no NotImplementedError in
the default flow."""

import io
import struct
import wave

import numpy as np
import pytest

from yetisearch_spark.imagecodec import (decode_bmp, decode_image,
                                         decode_png, encode_png,
                                         grid_features, resize_nearest,
                                         sniff_format)


def _gradient(h, w, c):
    y = np.arange(h, dtype=np.uint8)[:, None, None]
    x = np.arange(w, dtype=np.uint8)[None, :, None]
    ch = np.arange(c, dtype=np.uint8)[None, None, :]
    return ((y * 7 + x * 13 + ch * 41) % 251).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(channels, ftype):
    img = _gradient(13, 17, channels)
    data = encode_png(img, filter_type=ftype)
    assert sniff_format(data) == "png"
    out = decode_png(data)
    assert out.shape == img.shape
    assert (out == img).all(), (channels, ftype)


def test_png_palette():
    # hand-build a palette PNG: 2x2 indices into a 3-color palette
    import zlib
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 2, 1])  # two rows, filter 0
    png = (sig + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = decode_png(png)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0]
    assert out[1, 0].tolist() == [0, 0, 255]
    assert out[1, 1].tolist() == [0, 255, 0]


def _bmp_bytes(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer for fixtures."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    data = bytearray()
    for y in range(h - 1, -1, -1):
        row = img[y][:, [2, 1, 0]].tobytes()  # RGB→BGR
        data.extend(row)
        data.extend(b"\x00" * (stride - len(row)))
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(data), 2835, 2835, 0, 0))
    return header + bytes(data)


def test_bmp_decode():
    img = _gradient(5, 6, 3)
    out = decode_bmp(_bmp_bytes(img))
    assert (out == img).all()


def test_resize_and_grid_features():
    img = _gradient(32, 32, 3)
    small = resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)
    feats = grid_features(img, grid=8)
    assert feats.shape == (64,)
    assert ((feats >= 0) & (feats <= 1)).all()


def test_image_features_real_spark(spark):
    from yetisearch_spark.multimodal import image_features
    imgs = {i: _gradient(16 + i, 20 + i, 3) for i in range(3)}
    rows = [(i, "image", bytearray(encode_png(im, filter_type=i % 5 if i % 5 != 3 else 0)), {})
            for i, im in imgs.items()]
    rows.append((99, "image", bytearray(b"not an image"), {}))
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>")
    out = {r["media_id"]: r for r in image_features(df, feature_dim=64).collect()}
    for i, im in imgs.items():
        r = out[i]
        assert (r["width"], r["height"], r["channels"]) == (20 + i, 16 + i, 3)
        want = grid_features(im, 8)
        got = np.array(r["features"], dtype=np.float32)
        assert np.allclose(got, want, atol=1e-6)
    assert out[99]["width"] is None and out[99]["features"] is None


def _wav_bytes(sr=8000, seconds=0.5, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    samples = (np.sin(2 * np.pi * freq * t) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_audio_features_real_spark(spark):
    from yetisearch_spark.multimodal import audio_features
    wav = _wav_bytes()
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav), {}),
         (2, "audio", bytearray(b"junk"), {})],
        "media_id long, kind string, payload binary, meta map<string,string>")
    out = {r["media_id"]: r for r in audio_features(df, n_frames=8).collect()}
    r = out[1]
    assert r["sample_rate"] == 8000
    assert abs(r["duration_s"] - 0.5) < 1e-6
    # a steady sine has ~constant RMS ≈ amplitude/√2
    e = np.array(r["frame_energy"])
    assert e.shape == (8,)
    assert np.allclose(e, 20000 / 32768 / np.sqrt(2), atol=0.02)
    assert out[2]["sample_rate"] is None


def test_video_frame_container_real_spark(spark):
    from yetisearch_spark.multimodal import image_features, sample_video_frames
    frames = [_gradient(8, 8, 3), _gradient(9, 9, 3), _gradient(10, 10, 3)]
    blobs = [encode_png(f) for f in frames]
    container = b"".join(blobs)
    offsets = []
    pos = 0
    for b in blobs:
        offsets.append(pos)
        pos += len(b)
    meta = {"frame_offsets": ",".join(map(str, offsets)),
            "frame_ts_ms": "0,500,1000"}
    df = spark.createDataFrame(
        [(7, "video", bytearray(container), meta)],
        "media_id long, kind string, payload binary, meta map<string,string>")
    sampled = sample_video_frames(df, every_ms=1000, max_frames=16)
    rows = sorted(sampled.collect(), key=lambda r: r["frame_idx"])
    # 1000ms sampling keeps frames at ts 0 and 1000, skips 500
    assert [r["frame_idx"] for r in rows] == [0, 2]
    # the sliced frames are REAL decodable PNGs → feed the image path
    fr = spark.createDataFrame(
        [(r["frame_idx"], "image", bytearray(r["frame"]), {}) for r in rows],
        "media_id long, kind string, payload binary, meta map<string,string>")
    feats = {r["media_id"]: r for r in image_features(fr).collect()}
    assert (feats[0]["width"], feats[0]["height"]) == (8, 8)
    assert (feats[2]["width"], feats[2]["height"]) == (10, 10)
