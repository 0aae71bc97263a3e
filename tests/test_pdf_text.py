"""Pure-stdlib PDF text extraction: handcrafted minimal PDFs (plain and
FlateDecode content streams), escapes, TJ arrays, page ordering, and the
stub boundary for textless PDFs."""

from __future__ import annotations

import zlib

import pytest

from agentic_doc_spark.sources.pdf_text import extract_pdf_blocks
from agentic_doc_spark.sources.layout import split_blocks


def _pdf(*content_streams: bytes, compress: bool = False) -> bytes:
    """A minimal (not strictly valid, but generator-shaped) PDF body."""
    out = [b"%PDF-1.4\n"]
    for i, cs in enumerate(content_streams):
        body = zlib.compress(cs) if compress else cs
        filt = b"/Filter /FlateDecode " if compress else b""
        out.append(
            b"%d 0 obj\n<< %s/Length %d >>\nstream\n" % (i + 1, filt, len(body))
            + body
            + b"\nendstream\nendobj\n"
        )
    out.append(b"%%EOF\n")
    return b"".join(out)


PAGE1 = b"BT /F1 12 Tf 72 720 Td (Hello world) Tj ET\nBT (Second block) Tj ET"
PAGE2 = b"BT [(Kerned ) -250 (text)] TJ ET"
ESCAPED = rb"BT (Parens \(nested\) and \\ backslash \101) Tj ET"
HEXSTR = b"BT <48 69> Tj ET"


def test_plain_streams_two_pages():
    blocks = extract_pdf_blocks(_pdf(PAGE1, PAGE2))
    assert blocks == [
        (0, "Hello world"),
        (0, "Second block"),
        (1, "Kerned text"),
    ]


def test_flate_streams():
    blocks = extract_pdf_blocks(_pdf(PAGE1, PAGE2, compress=True))
    assert [t for _, t in blocks] == ["Hello world", "Second block", "Kerned text"]


def test_escapes_and_hex():
    blocks = extract_pdf_blocks(_pdf(ESCAPED, HEXSTR))
    assert blocks[0][1] == "Parens (nested) and \\ backslash A"
    assert blocks[1][1] == "Hi"


_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0003> <0048>
<0004> <0065006C>
endbfchar
2 beginbfrange
<0010> <0012> <006C>
<0020> <0021> [<0021> <003F>]
endbfrange
endcmap
CMap defined
"""


def test_type0_hex_through_tounicode_cmap():
    # the Word/LibreOffice layout: Type0 font, 2-byte hex show strings,
    # ToUnicode CMap mapping CIDs to text. bfchar (incl. multi-unit dst),
    # bfrange increment form, and bfrange array form all resolve.
    # 0003→H, 0004→el, 0010..0012→l,m,n, 0020→!, 0021→?
    content = b"BT <0003 0004 0010 0020> Tj ET"
    blocks = extract_pdf_blocks(_pdf(_CMAP, content, compress=True))
    assert blocks == [(0, "Hell!")]


def test_type0_array_tj_and_simple_hex_coexist():
    # a TJ array of 2-byte hex runs decodes through the cmap; a classic
    # 1-byte hex string in the same doc keeps its latin-1 reading
    # (coverage heuristic: its byte pairs are not cmap codes)
    content = b"BT [<00030004> -120 <00100011>] TJ ET\nBT <48 69> Tj ET"
    blocks = extract_pdf_blocks(_pdf(_CMAP, content))
    assert [t for _, t in blocks] == ["Hellm", "Hi"]


def test_unmapped_type0_still_skipped():
    # hex codes outside every cmap (and failing the latin-1 plausibility
    # guard) must not produce garbage blocks
    content = b"BT <DEAD BEEF 0bad F00d> Tj ET"
    blocks = extract_pdf_blocks(_pdf(_CMAP, content))
    assert blocks == []


def test_textless_pdf_hits_stub_boundary():
    with pytest.raises(NotImplementedError, match="text layer"):
        split_blocks(b"%PDF-1.4\njust bytes, no streams", "pdf")


def test_pdf_route_through_layout(spark, tmp_path):
    from agentic_doc_spark.pipeline import extract
    from agentic_doc_spark.sources.layout import layout_parse
    from agentic_doc_spark.sources.resolve import read_binary_dir

    (tmp_path / "doc.pdf").write_bytes(_pdf(PAGE1, PAGE2, compress=True))
    raw = read_binary_dir(spark, str(tmp_path))
    assert raw.collect()[0]["doc_type"] == "pdf"  # magic sniff
    parsed = extract(layout_parse(raw)).collect()[0]
    assert [s["text"] for s in parsed["spans"]] == [
        "Hello world",
        "Second block",
        "Kerned text",
    ]
    assert parsed["markdown"].startswith("Hello world")
