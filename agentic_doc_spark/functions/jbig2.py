"""JBIG2 generic-region codec (ITU-T T.88) — pure stdlib + numpy.

Scope (a deliberate, surfaced boundary like functions/ccitt.py): the MQ
arithmetic coder (T.88 Annex E — the same coder JPEG 2000 uses, with the
published 47-state Qe table) and GENERIC REGION segments coded with
template 0 at the nominal AT positions, with or without typical-
prediction (TPGDON). That covers JBIG2 streams whose pages are plain
arithmetic-coded bitmaps — the "better fax" mode — plus this module's
own fixture encoder. Symbol dictionaries / text / halftone regions and
MMR-coded regions return None at the PDF boundary (surfaced, the caller
degrades to an error row), as does anything referencing /JBIG2Globals.

The PDF embedding (PDF 32000 §7.4.7) carries JBIG2 segments WITHOUT the
file header; ``decode_embedded`` scans segment headers and decodes the
first immediate generic region.

Self-checks in tests/test_pdf_text.py: MQ encode↔decode round-trip fuzz,
generic-region round-trips against raw bitmaps (both TPGDON modes), and
an end-to-end PDF /JBIG2Decode image extraction. As with CCITT, no
third-party JBIG2 implementation exists in this container to
cross-check; the Qe table is transcribed from the published standard and
the encoder/decoder are INDEPENDENT walks of the two spec procedures.

Scale note: per-page kernel inside mapInPandas decode ladders — a
pixel-loop Python decoder bounded by page size, never a per-row Spark
UDF.
"""

from __future__ import annotations

import struct

import numpy as np

#: T.88 Table E.1 (shared with JPEG 2000): (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 Annex E.3 decoding procedure (software conventions)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.c = (self._b() << 16)
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _b(self, off: int = 0) -> int:
        i = self.bp + off
        return self.data[i] if i < len(self.data) else 0xFF

    def _bytein(self) -> None:
        if self._b() == 0xFF:
            if self._b(1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._b() << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._b() << 8
            self.ct = 8
        self.c &= 0xFFFFFFFF

    def decode(self, cx: list[int]) -> int:
        """One bit under context state cx = [index, mps]."""
        icx, mps = cx
        qe, nmps, nlps, switch = _QE[icx]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = mps
                cx[0] = nmps
            else:
                d = 1 - mps
                if switch:
                    cx[1] = 1 - mps
                cx[0] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            self.c &= 0xFFFFFFFF
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                if switch:
                    cx[1] = 1 - mps
                cx[0] = nlps
            else:
                d = mps
                cx[0] = nmps
        # renormalize
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E.2 encoding procedure (classic dummy-first-byte
    form: BP starts one position before the stream; a carry that
    propagates into the dummy makes it a real leading byte)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray(b"\x00")  # dummy byte at BP
        self.bp = 0

    def encode(self, cx: list[int], d: int) -> None:
        icx, mps = cx
        qe, nmps, nlps, switch = _QE[icx]
        if d == mps:
            self.a -= qe
            if not (self.a & 0x8000):
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                cx[0] = nmps
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx[1] = 1 - mps
            cx[0] = nlps
            self._renorm()

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        if self.out[self.bp] == 0xFF:
            self._stuff()
            return
        if self.c > 0x7FFFFFF:
            self.out[self.bp] += 1
            if self.out[self.bp] == 0xFF:
                self.c &= 0x7FFFFFF
                self._stuff()
                return
        self.out.append((self.c >> 19) & 0xFF)
        self.bp = len(self.out) - 1
        self.c &= 0x7FFFF
        self.ct = 8

    def _stuff(self) -> None:
        self.out.append((self.c >> 20) & 0xFF)
        self.bp = len(self.out) - 1
        self.c &= 0xFFFFF
        self.ct = 7

    def flush(self) -> bytes:
        # SETBITS (E.2.9) + two final byteouts
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        # drop the dummy unless a carry made it a real leading byte
        return bytes(self.out[1:] if self.out[0] == 0 else self.out)


# --- generic region, template 0, nominal AT pixels ------------------------

#: nominal adaptive-template offsets for GB template 0 (T.88 6.2.5.3)
_AT_NOMINAL = ((3, -1), (-3, -1), (2, -2), (-2, -2))
_SLTP_CX = 0x9B25  # TPGDON context value for template 0


def _gb0_context(page: np.ndarray, x: int, y: int, w: int) -> int:
    """16-bit template-0 context at (x, y), assembled in the T.88
    raster bit order (as in the reference decoders): bits 15..11 = row
    y−2 left-to-right x−2..x+2 (the ±2 positions are nominal A4/A3),
    bits 10..4 = row y−1 x−3..x+3 (±3 are nominal A2/A1), bits 3..0 =
    row y, x−4..x−1. The TPGDON pseudo-pixel context 0x9B25 is defined
    against THIS ordering — a permuted assembly round-trips against
    itself but garbles third-party TPGDON streams."""
    def px(dx: int, dy: int) -> int:
        xx, yy = x + dx, y + dy
        if yy < 0 or xx < 0 or xx >= w:
            return 0
        return int(page[yy, xx])

    return (
        (px(-2, -2) << 15) | (px(-1, -2) << 14) | (px(0, -2) << 13)
        | (px(1, -2) << 12) | (px(2, -2) << 11)
        | (px(-3, -1) << 10) | (px(-2, -1) << 9) | (px(-1, -1) << 8)
        | (px(0, -1) << 7) | (px(1, -1) << 6) | (px(2, -1) << 5)
        | (px(3, -1) << 4)
        | (px(-4, 0) << 3) | (px(-3, 0) << 2) | (px(-2, 0) << 1)
        | px(-1, 0)
    )


def decode_generic_region(
    data: bytes, width: int, height: int, tpgdon: bool = False
) -> np.ndarray:
    """Arithmetic generic region decode, template 0, nominal ATs →
    (h, w) uint8 with 1 = black."""
    if width <= 0 or height <= 0 or width * height > 64_000_000:
        raise ValueError("bad JBIG2 region dimensions")
    dec = MQDecoder(data)
    cxs: dict[int, list[int]] = {}

    def cx_for(val: int) -> list[int]:
        st = cxs.get(val)
        if st is None:
            st = [0, 0]
            cxs[val] = st
        return st

    page = np.zeros((height, width), dtype=np.uint8)
    ltp = 0
    for y in range(height):
        if tpgdon:
            if dec.decode(cx_for(_SLTP_CX)):
                ltp ^= 1
            if ltp:
                if y > 0:
                    page[y] = page[y - 1]
                continue
        row = page[y]
        for x in range(width):
            ctx = _gb0_context(page, x, y, width)
            row[x] = dec.decode(cx_for(ctx))
    return page


def encode_generic_region(
    page: np.ndarray, tpgdon: bool = False
) -> bytes:
    """Fixture encoder: the exact mirror of ``decode_generic_region``."""
    page = (np.asarray(page) != 0).astype(np.uint8)
    height, width = page.shape
    enc = MQEncoder()
    cxs: dict[int, list[int]] = {}

    def cx_for(val: int) -> list[int]:
        st = cxs.get(val)
        if st is None:
            st = [0, 0]
            cxs[val] = st
        return st

    ltp = 0
    for y in range(height):
        if tpgdon:
            same = y > 0 and bool((page[y] == page[y - 1]).all())
            sltp = 1 if (same != bool(ltp)) else 0
            enc.encode(cx_for(_SLTP_CX), sltp)
            if sltp:
                ltp ^= 1
            if ltp:
                continue
        for x in range(width):
            ctx = _gb0_context(page, x, y, width)
            enc.encode(cx_for(ctx), int(page[y, x]))
    return enc.flush()


# --- PDF-embedded segment stream ------------------------------------------


def encode_embedded(page: np.ndarray, tpgdon: bool = False) -> bytes:
    """Bilevel page → PDF-embedded JBIG2 stream: page-info segment +
    one immediate generic region segment (type 38)."""
    page = (np.asarray(page) != 0).astype(np.uint8)
    h, w = page.shape
    segs = bytearray()
    # page info (type 48, T.88 7.4.8): width, height, xres, yres,
    # flags byte, 2-byte striping — 19 bytes
    pinfo = struct.pack(">IIII", w, h, 0, 0) + b"\x00" + b"\x00\x00"
    segs += struct.pack(">IBB", 0, 48, 0) + b"\x01" + struct.pack(
        ">I", len(pinfo)
    ) + pinfo
    # immediate generic region (type 38)
    body = struct.pack(">IIII", w, h, 0, 0) + b"\x00"  # region info
    flags = 0x08 if tpgdon else 0x00  # MMR=0, template 0, TPGDON bit 3
    body += bytes([flags])
    for dx, dy in _AT_NOMINAL:
        body += struct.pack("bb", dx, dy)
    body += encode_generic_region(page, tpgdon)
    segs += struct.pack(">IBB", 1, 38, 0) + b"\x01" + struct.pack(
        ">I", len(body)
    ) + body
    return bytes(segs)


def decode_embedded(
    data: bytes,
    max_pixels: int = 64_000_000,
    expect: tuple[int, int] | None = None,
) -> np.ndarray:
    """Scan a PDF-embedded JBIG2 segment stream and decode the FIRST
    immediate generic region (types 36/38/39, MMR=0, template 0,
    nominal ATs). Raises ValueError for anything outside that scope —
    the caller surfaces the gap. ``expect=(w, h)`` cross-checks the
    region dimensions against the container's declared size, so a
    corrupt header claiming a huge region fails fast instead of
    spinning the per-pixel decode loop for minutes."""
    pos = 0
    n = len(data)
    while pos + 11 <= n:
        _num, flags = struct.unpack_from(">IB", data, pos)
        stype = flags & 0x3F
        page_assoc_4 = bool(flags & 0x40)
        pos += 5
        # referred-to segments: short form only (count ≤ 4)
        rts = data[pos]
        count = rts >> 5
        if count == 7:
            raise ValueError("JBIG2 long referred-to form unsupported")
        pos += 1
        # referred segment numbers: 1/2/4 bytes by the REFERRING
        # segment's number (T.88 7.2.5)
        ref_size = 1 if _num <= 256 else (2 if _num <= 65536 else 4)
        pos += count * ref_size
        pos += 4 if page_assoc_4 else 1
        (dlen,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if dlen == 0xFFFFFFFF:
            raise ValueError("JBIG2 unknown-length segment unsupported")
        body = data[pos : pos + dlen]
        pos += dlen
        if stype in (36, 38, 39):
            if len(body) < 18:
                raise ValueError("JBIG2 region segment too short")
            w, h, _x, _y = struct.unpack_from(">IIII", body, 0)
            if w * h > max_pixels or w <= 0 or h <= 0:
                raise ValueError("implausible JBIG2 region dimensions")
            if expect is not None and (w, h) != expect:
                raise ValueError(
                    f"JBIG2 region {w}x{h} does not match the "
                    f"container's declared {expect[0]}x{expect[1]}"
                )
            gflags = body[17]
            if gflags & 0x01:
                raise ValueError("JBIG2 MMR generic region unsupported")
            template = (gflags >> 1) & 0x03
            if template != 0:
                raise ValueError("JBIG2 template != 0 unsupported")
            tpgdon = bool(gflags & 0x08)
            ats = struct.unpack_from("bbbbbbbb", body, 18)
            if tuple(ats) != tuple(
                v for pair in _AT_NOMINAL for v in pair
            ):
                raise ValueError("JBIG2 non-nominal AT pixels unsupported")
            return decode_generic_region(body[26:], w, h, tpgdon)
        if stype in (0, 4, 6, 7, 16, 20, 22, 23, 40, 42, 43):
            raise ValueError(
                f"JBIG2 segment type {stype} (symbol/text/halftone/"
                "refinement) unsupported"
            )
    raise ValueError("no generic region segment found in JBIG2 stream")
