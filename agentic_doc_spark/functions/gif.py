"""Pure-stdlib GIF codec (decode 87a/89a + fixture encoder).

Implements the public GIF specification (GIF89a, CompuServe 1990):
logical screen descriptor, global/local color tables, graphic control
extensions (transparency, disposal), interlacing, and variable-width
LZW decompression (3-12 bit codes, LSB-first bit packing, clear/EOI).
Animations decode to a list of frames COMPOSED onto the canvas per the
disposal method — the shape video frame-sampling needs.

The encoder exists to build test fixtures (palette-exact, real LZW
with width growth and dictionary reset); round-tripping through it
pins the decoder without any third-party imagery.

No counterpart exists in the reference repo (it offloads raster work
to cv2/PIL, agentic_doc/utils.py); this is a from-spec implementation
like functions/png.py and functions/jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 64_000_000  # dimension sanity bound, matches png.py's guard


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, max_out: int) -> bytes:
    """GIF LZW: codes start at min_code_size+1 bits, grow to 12; CLEAR
    resets the table. ``max_out`` bounds output (zip-bomb guard)."""
    clear = 1 << min_code_size
    end = clear + 1
    # table is CODE-indexed: base literals, two dummy slots for
    # clear/end, then appended strings
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table) and code != end:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK case
        else:
            raise ValueError(
                f"corrupt LZW stream: code {code} of {len(table)}"
            )
        out += entry
        if len(out) > max_out:
            raise ValueError("LZW output exceeds declared image size")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encoder with width growth and table reset at 4096."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    if not indices:
        emit(end, width)
    else:
        seq = bytes(indices[:1])
        for b in indices[1:]:
            cand = seq + bytes([b])
            if cand in table:
                seq = cand
                continue
            emit(table[seq], width)
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
            if next_code > 4095:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                width = min_code_size + 1
                next_code = end + 1
            seq = bytes([b])
        emit(table[seq], width)
        emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container parsing
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (bytes,
    position after the 0 terminator)."""
    chunks = []
    n = len(data)
    while pos < n:
        size = data[pos]
        pos += 1
        if size == 0:
            break
        chunks.append(data[pos : pos + size])
        pos += size
    return b"".join(chunks), pos


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, h, step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


def gif_frames(
    data: bytes, max_frames: int = 0, stride: int = 1
) -> list[np.ndarray]:
    """Decode a GIF into COMPOSED RGB frames (uint8 (h, w, 3) each).

    Composition follows the 89a disposal model: frames draw onto the
    persistent canvas (disposal 0/1); disposal 2 restores the frame's
    rect to the background color; disposal 3 restores the pre-frame
    pixels; transparent pixels leave the canvas unchanged.
    ``max_frames`` > 0 stops early. ``stride`` > 1 RETAINS only every
    stride-th composed frame (frame sampling) — every frame must still
    be composed for correctness, but the returned list holds only the
    sampled copies, bounding memory to n/stride canvases."""
    if not is_gif(data):
        raise ValueError("not a GIF")
    try:
        return _gif_frames(data, max_frames, max(stride, 1))
    except (struct.error, IndexError) as ex:
        # truncated headers/blocks fold into the one contract exception
        raise ValueError(f"corrupt GIF: {ex}") from ex


def _gif_frames(
    data: bytes, max_frames: int, stride: int
) -> list[np.ndarray]:
    w, h, flags, bg_idx, _ = struct.unpack_from("<HHBBB", data, 6)
    if w * h > MAX_PIXELS or w == 0 or h == 0:
        raise ValueError(f"implausible GIF dimensions {w}x{h}")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n

    bg_rgb = (
        gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.ones((h, w, 3), dtype=np.uint8) * bg_rgb
    frames: list[np.ndarray] = []
    n_composed = 0
    transparent: int | None = None
    disposal = 0

    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            if label == 0xF9:  # graphic control
                size = data[pos + 2]
                packed = data[pos + 3]
                disposal = (packed >> 2) & 0x07
                transparent = data[pos + 6] if packed & 0x01 else None
                pos += 3 + size
                _, pos = _sub_blocks(data, pos)
            else:
                pos += 2
                _, pos = _sub_blocks(data, pos)
            continue
        if b != 0x2C:  # image descriptor expected
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        fx, fy, fw, fh, fflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("GIF frame rect outside logical screen")
        ct = gct
        if fflags & 0x80:
            cn = 2 << (fflags & 0x07)
            ct = np.frombuffer(
                data[pos : pos + 3 * cn], dtype=np.uint8
            ).reshape(cn, 3)
            pos += 3 * cn
        if ct is None:
            raise ValueError("GIF frame without any color table")
        min_code = data[pos]
        pos += 1
        raw, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(raw, min_code, fw * fh), dtype=np.uint8
        )
        if len(idx) < fw * fh:  # pad truncated frames with background
            idx = np.concatenate(
                [idx, np.full(fw * fh - len(idx), 0, np.uint8)]
            )
        idx = idx[: fw * fh].reshape(fh, fw)
        if fflags & 0x40:
            idx = _deinterlace(idx)
        region = canvas[fy : fy + fh, fx : fx + fw]
        before = region.copy() if disposal == 3 else None
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        if n_composed % stride == 0:
            frames.append(canvas.copy())
            if max_frames and len(frames) >= max_frames:
                return frames
        n_composed += 1
        if disposal == 2:
            canvas[fy : fy + fh, fx : fx + fw] = bg_rgb
        elif disposal == 3 and before is not None:
            # restore-to-previous: the next frame composes over the
            # pre-frame pixels, not over what this frame drew
            canvas[fy : fy + fh, fx : fx + fw] = before
        transparent = None
        disposal = 0
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First composed frame as RGB uint8 (h, w, 3)."""
    frames = gif_frames(data, max_frames=1)
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames[0]


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------


def encode_gif(
    frames: list[np.ndarray],
    interlace: bool = False,
    transparent_index: int | None = None,
) -> bytes:
    """Encode RGB uint8 frames as a GIF89a with one shared exact
    palette built from the frames' distinct colors (≤256 required).
    Fixture-grade: no quantization, no dithering."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    seen: set[tuple[int, int, int]] = set()
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        seen |= {tuple(int(x) for x in px) for px in f.reshape(-1, 3)}
    if len(seen) > 256:
        raise ValueError(f"{len(seen)} distinct colors > 256")
    # sorted palette → deterministic indices (callers can predict the
    # transparent_index of a known color)
    colors = {c: i for i, c in enumerate(sorted(seen))}
    depth = max(1, (len(colors) - 1).bit_length())
    n_pal = 1 << depth
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    for c, i in colors.items():
        pal[i] = c

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    min_code = max(2, depth)
    for f in frames:
        if transparent_index is not None or len(frames) > 1:
            # graphic control: keep-disposal + optional transparency
            packed = (1 << 2) | (1 if transparent_index is not None else 0)
            out += struct.pack(
                "<BBBBHBB",
                0x21,
                0xF9,
                4,
                packed,
                4,
                transparent_index or 0,
                0,
            )
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = np.array(
            [colors[tuple(int(x) for x in px)] for px in f.reshape(-1, 3)],
            dtype=np.uint8,
        ).reshape(h, w)
        if interlace:
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, h, step))
            idx = idx[rows]
        out.append(min_code)
        comp = _lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(comp), 255):
            block = comp[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)
