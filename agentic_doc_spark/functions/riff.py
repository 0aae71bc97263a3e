"""Minimal pure-stdlib RIFF/AVI demuxer for MJPEG video frames.

Parses the public RIFF container layout (Microsoft AVI spec): the
top-level ``RIFF....AVI `` header, nested ``LIST`` chunks, and the
``movi`` payload whose ``##dc``/``##db`` stream chunks carry one
compressed frame each. For MJPEG AVIs those frames are baseline JPEG
bytes — decodable by functions/jpeg.py — which makes video
frame-sampling REAL end to end with zero native media libraries.
Anything that is not a RIFF/AVI (or carries no video chunks) yields an
empty frame list and the caller keeps its deterministic-fake path.

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


def extract_avi_frames(data: bytes) -> list[bytes]:
    """AVI bytes → ordered list of raw video-frame payloads (JPEG bytes
    for MJPEG streams). Empty list when not an AVI / no video chunks."""
    if not is_avi(data):
        return []
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
                found.append((payload, bytes(data[payload : payload + size])))
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
