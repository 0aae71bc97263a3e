"""Minimal pure-stdlib RIFF/AVI demuxer for MJPEG video frames.

Parses the public RIFF container layout (Microsoft AVI spec): the
top-level ``RIFF....AVI `` header, nested ``LIST`` chunks, and the
``movi`` payload whose ``##dc``/``##db`` stream chunks carry one frame
each. Two frame codecs decode for real: MJPEG (frames are JPEG bytes —
baseline or progressive, functions/jpeg.py) and UNCOMPRESSED BI_RGB
DIBs (the ``strf`` BITMAPINFOHEADER declares biCompression 0; bottom-up
BGR(A) rows transcode to PNG bytes so the downstream decode ladder
needs no new format). Anything else (or not a RIFF/AVI at all) yields
an empty frame list and the caller keeps its deterministic-fake path.

Written against the public container layout only (RIFF chunk grammar:
fourcc + uint32le size + payload, word-aligned).
"""

from __future__ import annotations

import struct

_VIDEO_SUFFIXES = (b"dc", b"db")  # compressed / uncompressed DIB frame


def is_avi(data: bytes) -> bool:
    return (
        len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"AVI "
    )


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a chunk run."""
    i = start
    while i + 8 <= end:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        payload = i + 8
        if payload + size > end:
            break  # truncated chunk: stop, keep what we have
        yield fourcc, payload, size
        i = payload + size + (size & 1)  # chunks are word-aligned


def _parse_strf(data: bytes) -> tuple[int, int, int] | None:
    """The VIDEO stream's BITMAPINFOHEADER → (width, height, bitcount)
    when it declares UNCOMPRESSED BI_RGB frames (biCompression == 0 and
    24/32-bit); None for compressed streams (MJPG etc.). The strf is
    located via its own strl's ``strh`` with fccType 'vids' — an
    audio-first AVI's WAVEFORMAT strf must never shadow it."""
    pos = 0
    while True:
        i = data.find(b"strh", pos)
        if i < 0:
            return None
        pos = i + 4
        if data[i + 8 : i + 12] != b"vids":
            continue
        j = data.find(b"strf", i)
        if j < 0 or j + 8 + 40 > len(data):
            return None
        hdr = data[j + 8 : j + 48]
        _sz, w, h, _planes, bits, comp = struct.unpack("<IiiHHI", hdr[:20])
        if comp == 0 and bits in (24, 32) and 0 < w * abs(h) <= 64_000_000:
            return w, h, bits
        return None


def _dib_to_png(payload: bytes, w: int, h: int, bits: int) -> bytes | None:
    """One uncompressed BI_RGB frame → PNG bytes: rows are 4-byte
    aligned, BGR(A) order, bottom-up when height is positive (the DIB
    convention; negative height = top-down)."""
    import numpy as np  # lazy: keeps the demux path stdlib-only

    from agentic_doc_spark.functions.png import encode_png

    ch = bits // 8
    height = abs(h)
    stride = (w * ch + 3) & ~3
    if len(payload) < stride * height:
        return None
    rows = np.frombuffer(
        payload[: stride * height], dtype=np.uint8
    ).reshape(height, stride)[:, : w * ch].reshape(height, w, ch)
    if h > 0:
        rows = rows[::-1]  # bottom-up → top-down
    rgb = rows[:, :, [2, 1, 0]]  # BGR(A) → RGB (alpha dropped)
    return encode_png(np.ascontiguousarray(rgb))


def extract_avi_frames(data: bytes) -> list[bytes]:
    """AVI bytes → ordered list of DECODABLE video-frame payloads: JPEG
    bytes for MJPEG streams, PNG-transcoded frames for uncompressed
    BI_RGB DIB streams. Empty list when not an AVI / no video chunks."""
    if not is_avi(data):
        return []
    raw_fmt = _parse_strf(data)
    found: list[tuple[int, bytes]] = []
    # explicit stack, not recursion: a crafted stream of deeply nested
    # LIST headers must degrade gracefully, never RecursionError a task.
    # Frames carry their stream offset and sort at the end, so traversal
    # order (which LIFO perturbs for 'rec '-grouped AVIs) never changes
    # the emitted frame order.
    stack: list[tuple[int, int]] = [(12, len(data))]
    while stack:
        start, end = stack.pop()
        for fourcc, payload, size in _iter_chunks(data, start, end):
            if fourcc == b"LIST" and size >= 4:
                # LIST payload = list type fourcc + sub-chunks
                stack.append((payload + 4, payload + size))
            elif (
                len(fourcc) == 4
                and fourcc[2:4] in _VIDEO_SUFFIXES
                and fourcc[:2].isdigit()
                and size > 0
            ):
                frame = bytes(data[payload : payload + size])
                if raw_fmt is not None:
                    # strf says BI_RGB: EVERY frame is a raw DIB — no
                    # content sniffing (a DIB whose first pixel bytes
                    # spell FF D8 is still a DIB)
                    png = _dib_to_png(frame, *raw_fmt)
                    if png is None:
                        continue  # malformed raw frame: skip, keep rest
                    frame = png
                found.append((payload, frame))
    return [f for _, f in sorted(found, key=lambda t: t[0])]


def encode_avi_mjpeg(frames: list[bytes], width: int = 0, height: int = 0) -> bytes:
    """Pack JPEG frames into a minimal spec-shaped MJPEG AVI (RIFF →
    hdrl(avih) + movi(00dc...)). Test/fixture-side twin of the demuxer;
    headers carry enough (frame count, dims) to be honest, not enough to
    drive a full-featured player."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    avih = struct.pack(
        "<14I",
        33333,  # us per frame (~30 fps)
        0, 0, 0,
        len(frames),
        0, 1, 0,
        width, height,
        0, 0, 0, 0,
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi_rawdib(frames_rgb, fps_us: int = 33333) -> bytes:
    """Pack RGB uint8 (h, w, 3) arrays into a minimal uncompressed
    BI_RGB AVI (strf BITMAPINFOHEADER + 00db bottom-up BGR frames with
    4-byte row alignment) — the fixture twin of the raw-DIB decode
    path."""
    import numpy as np

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    h, w = frames_rgb[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    avih = struct.pack(
        "<14I", fps_us, 0, 0, 0, len(frames_rgb), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = struct.pack("<4s4sI44x", b"vids", b"DIB ", 0)
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    strl = chunk(
        b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    dibs = []
    for f in frames_rgb:
        bgr = np.asarray(f, dtype=np.uint8)[:, :, [2, 1, 0]]
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        dibs.append(rows[::-1].tobytes())  # bottom-up
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --- WAVE (audio) ----------------------------------------------------------


def is_wav(data: bytes) -> bool:
    return (
        len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"WAVE"
    )


def parse_wav(data: bytes):
    """WAVE bytes → dict(sample_rate, channels, bits, samples) or None.

    Pure-stdlib PCM decode over the same RIFF chunk walk as the AVI
    demuxer: ``fmt `` (WAVEFORMAT) + ``data``. Supported: integer PCM
    8/16-bit (format 1) and IEEE float32 (format 3); samples come back
    as a mono float64 array in [-1, 1] (multi-channel downmixed by
    mean). Anything else → None (surfaced by the caller's ``decoded``
    flag, never silent garbage)."""
    if not is_wav(data):
        return None
    import numpy as np

    fmt = pcm = None
    for fourcc, payload, size in _iter_chunks(data, 12, len(data)):
        if fourcc == b"fmt " and size >= 16:
            fmt = struct.unpack("<HHIIHH", data[payload : payload + 16])
        elif fourcc == b"data":
            pcm = data[payload : payload + size]
    if fmt is None or pcm is None:
        return None
    audio_format, ch, sr, _brate, _balign, bits = fmt
    if not (1 <= ch <= 32 and 1000 <= sr <= 1_000_000):
        return None
    if audio_format == 1 and bits == 16:
        usable = len(pcm) // (2 * ch) * (2 * ch)
        x = np.frombuffer(pcm[:usable], dtype="<i2").astype(np.float64) / 32768.0
    elif audio_format == 1 and bits == 8:
        usable = len(pcm) // ch * ch
        x = (np.frombuffer(pcm[:usable], dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_format == 3 and bits == 32:
        usable = len(pcm) // (4 * ch) * (4 * ch)
        x = np.frombuffer(pcm[:usable], dtype="<f4").astype(np.float64)
    else:
        return None
    if ch > 1:
        x = x[: len(x) // ch * ch].reshape(-1, ch).mean(axis=1)
    return {"sample_rate": int(sr), "channels": int(ch), "bits": int(bits), "samples": x}


def encode_wav_pcm16(samples, sample_rate: int = 16000) -> bytes:
    """float array in [-1, 1] (mono (n,) or (n, ch)) → PCM16 WAV bytes —
    the fixture twin of ``parse_wav``."""
    import numpy as np

    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    ch = a.shape[1]
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    payload = pcm.reshape(-1).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * 2 * ch, 2 * ch, 16
    )

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    body = b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"data", payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body
