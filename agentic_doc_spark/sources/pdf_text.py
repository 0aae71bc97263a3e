"""Minimal pure-stdlib PDF text extraction (best-effort, text-first PDFs).

The reference rasterizes and ships pages to a remote parser; the container
here has no PDF library, but the PDF *text layer* of simple generators
(reportlab — the reference's own test fixtures, tests/conftest.py:76-141 —
LaTeX, many office exporters) is extractable with nothing but zlib:

1. scan the raw bytes for ``stream ... endstream`` objects,
2. FlateDecode (zlib) when the object dict says so,
3. within each content stream, read the text-showing operators
   (``Tj``, ``TJ``, ``'``, ``"``) inside BT/ET text objects, decoding
   PDF literal-string escapes and hex strings,
4. one BT/ET text object → one text block; one content stream with text
   → one page.

NOT a general PDF parser — no xref/object-graph walking, no CID/Type0
composite fonts, no encryption; anything it cannot read yields zero blocks
and the caller degrades to the documented stub path. This boundary is
explicit on purpose: the goal is unstubbing the common text-PDF case, not
silently mis-reading hard ones.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_TEXTOBJ_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
#: text-showing operators: (string) Tj | ' | "   and   [array] TJ
_SHOW_RE = re.compile(
    rb"""
    \( ((?:[^()\\]|\\.|\((?:[^()\\]|\\.)*\))*) \) \s* (?:Tj|'|") |
    \[ ((?:[^\]\\]|\\.)*) \] \s* TJ |
    < ([0-9A-Fa-f\s]+) > \s* (?:Tj|'|")
    """,
    re.VERBOSE | re.DOTALL,
)
_ARRAY_STR_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]+)>"
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            m = re.match(rb"\\([0-7]{1,3})", raw[i:])
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i += 1 + len(m.group(1))
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _decode_hex(raw: bytes) -> str:
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii")).decode("latin-1")


def _text_from_textobj(body: bytes) -> str:
    pieces: list[str] = []
    for m in _SHOW_RE.finditer(body):
        lit, arr, hx = m.groups()
        if lit is not None:
            pieces.append(_decode_literal(lit))
        elif hx is not None:
            pieces.append(_decode_hex(hx))
        else:
            for am in _ARRAY_STR_RE.finditer(arr):
                alit, ahx = am.groups()
                pieces.append(
                    _decode_literal(alit) if alit is not None else _decode_hex(ahx)
                )
    return "".join(pieces).strip()


#: stream dicts that are definitely not page content (images, fonts,
#: metadata) — random bytes inside them can coincidentally spell BT/ET
_NON_CONTENT = (
    b"/Image", b"/DCTDecode", b"/JPXDecode", b"/JBIG2Decode",
    b"/CCITTFaxDecode", b"/FontFile", b"/Metadata", b"/XML",
)


def _plausible_text(s: str) -> bool:
    """Guard against garbage decoded from binary streams: require mostly
    printable characters."""
    if not s:
        return False
    printable = sum(c.isprintable() or c in "\n\t" for c in s)
    return printable / len(s) >= 0.85


def extract_pdf_blocks(data: bytes) -> list[tuple[int, str]]:
    """PDF bytes → ordered (page_idx, text_block). Empty list when the
    file has no extractable text layer (scanned/encrypted/composite)."""
    blocks: list[tuple[int, str]] = []
    page = 0
    for m in _STREAM_RE.finditer(data):
        header = m.group(1)
        if any(k in header for k in _NON_CONTENT):
            continue
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        payload = data[start:end].rstrip(b"\r\n")
        if b"FlateDecode" in header:
            try:
                payload = zlib.decompress(payload)
            except zlib.error:
                continue
        if b"BT" not in payload:
            continue
        found = False
        for tm in _TEXTOBJ_RE.finditer(payload):
            text = _text_from_textobj(tm.group(1))
            if text and _plausible_text(text):
                blocks.append((page, text))
                found = True
        if found:
            page += 1
    return blocks
