"""Pure-numpy image codecs (PNG + BMP) — no external image libraries.

The multimodal pipeline needs a REAL decode path in an environment
without PIL/ffmpeg. PNG (the dominant lossless format) is fully
decodable with stdlib zlib + numpy: chunk parse → inflate → per-row
unfilter (all five filter types) → pixel array. BMP (24/32-bit
uncompressed) is a header parse + stride reshape. An encoder (filter
choice per row) exists so tests can build real byte-level fixtures and
round-trip them.

Supported PNG subset: 8-bit depth, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced — the shapes a
training-data pipeline actually meets in bulk; everything else raises
ValueError (callers surface nulls for undecodable rows).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str | None:
    if not payload:
        return None
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H, W, C). Palette images expand to RGB."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    channels = _CHANNELS[color_type]

    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    expected = (stride + 1) * height
    if len(raw) < expected:
        raise ValueError("truncated IDAT")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=off + 1).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            row = (row.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = row
        prev = out[y]

    img = out.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (H, W[, C]) → PNG bytes; ``filter_type`` applies one of the
    five per-row filters to every row (fixture/round-trip support)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c).astype(np.int32)
    bpp = c
    lines = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            left = np.concatenate((np.zeros(bpp, np.int32), row[:-bpp]))
            enc = (row - left) & 0xFF
        elif filter_type == 2:
            enc = (row - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate((np.zeros(bpp, np.int32), row[:-bpp]))
            enc = (row - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            enc = np.empty_like(row)
            for i in range(row.size):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                enc[i] = (int(row[i]) - _paeth(a, b, cc)) & 0xFF
        else:
            raise ValueError("bad filter type")
        lines.append(filter_type)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP decode (24/32-bit uncompressed)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError("unsupported BMP variant")
    top_down = height < 0
    height = abs(height)
    nchan = bpp // 8
    stride = (width * nchan + 3) & ~3
    rows = []
    for y in range(height):
        off = data_offset + y * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=width * nchan,
                            offset=off).reshape(width, nchan)
        rows.append(row)
    img = np.stack(rows)
    if not top_down:
        img = img[::-1]
    # BGR(A) → RGB(A)
    if nchan >= 3:
        img = img[:, :, [2, 1, 0] + ([3] if nchan == 4 else [])]
    return img


def decode_image(payload: bytes) -> np.ndarray:
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise ValueError("unknown image format")


# ---------------------------------------------------------------------------
# resize + pooled features (the downstream of a decode)
# ---------------------------------------------------------------------------

def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def grid_features(img: np.ndarray, grid: int = 8) -> np.ndarray:
    """Grayscale grid-mean pooling → grid² floats in [0, 1] (the classic
    cheap visual fingerprint; swap for a model forward pass at will)."""
    f = img.astype(np.float64)
    if f.ndim == 3:
        f = f[:, :, :3].mean(axis=2) if f.shape[2] >= 3 else f[:, :, 0]
    h, w = f.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    out = np.empty(grid * grid, dtype=np.float32)
    k = 0
    for i in range(grid):
        for j in range(grid):
            cell = f[ys[i]:max(ys[i + 1], ys[i] + 1),
                     xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[k] = cell.mean() / 255.0
            k += 1
    return out
