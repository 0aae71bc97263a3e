"""Pure-stdlib PNG codec (zlib + struct + numpy) — makes the raster
boundary REAL without an imaging library.

Covers the PNG subset a document pipeline produces/consumes: 8-bit
greyscale / RGB / RGBA, non-interlaced, all five scanline filters on
decode, filter-0 on encode. JPEG and exotic PNGs still route to PIL when
present (operators/multimodal.py), and the deterministic fake remains
the last-resort fallback. Public-spec implementation (RFC 2083 / W3C
PNG); no external code.

Perf boundary: filters None/Up/Sub decode fully vectorized; Average and
Paeth (which libpng picks adaptively) fall back to a per-byte Python
loop — when decoding libpng-authored rasters in bulk, install an imaging
library so the decode ladder takes the C path first.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (h, w, channels).

    Supports bit depth 8, color types 0/2/4/6, no interlacing."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[
            pos + 4 : pos + 8
        ]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("bad IHDR length")
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("bad IDAT payload size")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        filt = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            recon = filt
        elif ftype == 2:  # Up
            recon = (filt + prev) & 0xFF
        elif ftype == 1:  # Sub — per-channel cumulative sum mod 256
            recon = filt.reshape(-1, ch).cumsum(axis=0).astype(np.int64)
            recon = (recon & 0xFF).reshape(-1).astype(np.int32)
        elif ftype == 3:  # Average
            recon = filt.copy()
            for x in range(stride):
                left = recon[x - ch] if x >= ch else 0
                recon[x] = (recon[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = filt.copy()
            for x in range(stride):
                left = int(recon[x - ch]) if x >= ch else 0
                upleft = int(prev[x - ch]) if x >= ch else 0
                recon[x] = (recon[x] + _paeth(left, int(prev[x]), upleft)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out.reshape(height, width, ch)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, {1,2,3,4}) → PNG bytes (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(rows, 6))
        + _chunk(b"IEND", b"")
    )


def crop(arr: np.ndarray, x0: int, y0: int, x1: int, y1: int) -> np.ndarray:
    """Pixel-rect crop with bounds clamping (reference crop semantics,
    agentic_doc/utils.py:193-208: clamp then slice)."""
    h, w = arr.shape[:2]
    x0, x1 = max(0, min(x0, w)), max(0, min(x1, w))
    y0, y1 = max(0, min(y0, h)), max(0, min(y1, h))
    return arr[y0:y1, x0:x1]


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (index-map gather — the deterministic,
    dependency-free kernel; PIL's resampled variants slot in when
    available)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]
