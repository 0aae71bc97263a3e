"""Pure-stdlib BMP (Windows DIB) still-image decoder.

Covers the uncompressed BI_RGB cases that cover nearly all real .bmp
files: 24/32-bit true color and 1/4/8-bit paletted, top-down or
bottom-up, 4-byte row alignment (BITMAPINFOHEADER and later). The AVI
path (functions/riff.py) already decodes raw DIB *frames*; this is the
standalone-file counterpart for the image decode ladder.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 64_000_000


def is_bmp(data: bytes) -> bool:
    return data[:2] == b"BM" and len(data) > 54


def sniff_bmp(data: bytes) -> bool:
    """Strict header-plausibility probe for FILE ROUTING: the 2-byte
    'BM' magic alone false-positives on ordinary text ("BMW sales
    rose ..."), which must keep the text path. Requires a coherent
    BITMAPINFOHEADER: known header size, planes == 1, supported bit
    depth, plausible dimensions."""
    if not is_bmp(data):
        return False
    try:
        hdr_size = struct.unpack_from("<I", data, 14)[0]
        w, h_raw = struct.unpack_from("<ii", data, 18)
        planes, bits = struct.unpack_from("<HH", data, 26)
    except struct.error:
        return False
    h = abs(h_raw)
    return (
        hdr_size in (40, 52, 56, 108, 124)
        and planes == 1
        and bits in (1, 4, 8, 16, 24, 32)
        and 0 < w <= 1 << 20
        and 0 < h <= 1 << 20
        and w * h <= MAX_PIXELS
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """bytes → RGB uint8 (h, w, 3). Raises on compressed or exotic
    variants (surfaced boundary, not silent corruption)."""
    if not is_bmp(data):
        raise ValueError("not a BMP")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bits = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS(default masks)
        raise ValueError(f"unsupported BMP compression {compression}")
    if compression == 3:
        # BI_BITFIELDS: only the default BGRX layout is supported —
        # decoding with other masks would silently swap channels
        # masks sit at byte 54 for BITMAPINFOHEADER (appended) and for
        # V4/V5 headers (bV4RedMask field) alike
        try:
            r_m, g_m, b_m = struct.unpack_from("<III", data, 54)
        except struct.error as ex:
            raise ValueError("truncated BI_BITFIELDS masks") from ex
        if (r_m, g_m, b_m) != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError(
                f"non-default BI_BITFIELDS masks {r_m:#x}/{g_m:#x}/{b_m:#x}"
            )
    if bits not in (1, 4, 8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bits}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError(f"implausible BMP dimensions {w}x{h_raw}")

    palette = None
    if bits <= 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or (1 << bits)
        pal_off = 14 + hdr_size
        raw = np.frombuffer(
            data[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)
        palette = raw[:, [2, 1, 0]]  # BGRX → RGB

    row_bytes = (w * bits + 7) // 8
    stride = (row_bytes + 3) & ~3
    need = stride * h
    body = data[pix_off : pix_off + need]
    if len(body) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]

    if bits == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        return px[:, :, ::-1].copy()  # BGR → RGB
    if bits == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)
        return px[:, :, [2, 1, 0]].copy()
    if bits == 8:
        idx = rows[:, :w]
    elif bits == 4:
        pairs = rows[:, : (w + 1) // 2]
        hi = pairs >> 4
        lo = pairs & 0x0F
        idx = np.empty((h, (pairs.shape[1]) * 2), dtype=np.uint8)
        idx[:, 0::2] = hi
        idx[:, 1::2] = lo
        idx = idx[:, :w]
    else:  # 1-bit
        bits_arr = np.unpackbits(rows, axis=1)
        idx = bits_arr[:, :w]
    if palette is None or len(palette) == 0:
        raise ValueError("paletted BMP without palette")
    return palette[np.minimum(idx, len(palette) - 1)].copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) → 24-bit bottom-up BI_RGB BMP (fixtures)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = img[y, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (stride - len(row))
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header + body)
