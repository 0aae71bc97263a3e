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


def _cmap_stream(pairs: dict[int, str]) -> bytes:
    entries = "".join(
        f"<{c:04X}> <{''.join(f'{ord(u):04X}' for u in txt)}>\n"
        for c, txt in sorted(pairs.items())
    )
    return (
        b"/CIDInit /ProcSet findresource begin\nbegincmap\n"
        + b"%d beginbfchar\n" % len(pairs)
        + entries.encode()
        + b"endbfchar\nendcmap\n"
    )


def _graph_pdf(content: bytes, fonts: dict[bytes, dict[int, str]]) -> bytes:
    """A PDF with a real (page → contents → resources → font → ToUnicode)
    object graph: font objects at 10, 12, ...; their CMap streams one
    number above."""
    out = [b"%PDF-1.4\n"]
    font_entries = []
    num = 10
    for name, cmap in sorted(fonts.items()):
        font_entries.append(b"/%s %d 0 R " % (name, num))
        out.append(
            b"%d 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode %d 0 R >>\nendobj\n"
            % (num, num + 1)
        )
        payload = _cmap_stream(cmap)
        out.append(
            b"%d 0 obj\n<< /Length %d >>\nstream\n" % (num + 1, len(payload))
            + payload
            + b"\nendstream\nendobj\n"
        )
        num += 2
    out.append(
        b"1 0 obj\n<< /Type /Page /Contents 2 0 R /Resources << /Font << "
        + b"".join(font_entries)
        + b">> >> >>\nendobj\n"
    )
    out.append(
        b"2 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    return b"".join(out)


def test_two_cid_fonts_same_code_scoped_decoding():
    # two Type0 fonts assign the SAME codes different meanings; per-font
    # scoping through Tf operators must decode each show string with its
    # own font's CMap (the union heuristic would decode one of them with
    # the other font's mapping)
    content = (
        b"BT /F1 10 Tf <0003 0004 0005> Tj ET\n"
        b"BT /F2 10 Tf <0003 0004 0005> Tj ET"
    )
    pdf = _graph_pdf(
        content,
        {
            b"F1": {3: "c", 4: "a", 5: "t"},
            b"F2": {3: "d", 4: "o", 5: "g"},
        },
    )
    assert [t for _, t in extract_pdf_blocks(pdf)] == ["cat", "dog"]


def test_scoped_simple_font_hex_stays_latin1():
    # in a scoped stream, a hex string shown with a font that has NO
    # ToUnicode map (simple font) must keep its latin-1 reading even when
    # a CID font's CMap could cover its byte pairs
    content = (
        b"BT /F1 10 Tf <0003 0004> Tj ET\n"
        b"BT /FS 10 Tf <48 69> Tj ET"  # 'Hi', FS not a Type0 font
    )
    pdf = _graph_pdf(content, {b"F1": {3: "o", 4: "k", 0x4869: "ZZ"}})
    assert [t for _, t in extract_pdf_blocks(pdf)] == ["ok", "Hi"]


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


def _obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def _stream_obj(num: int, header: bytes, payload: bytes) -> bytes:
    return (
        b"%d 0 obj\n<< %s /Length %d >>\nstream\n" % (num, header, len(payload))
        + payload
        + b"\nendstream\nendobj\n"
    )


def _scanned_pdf(page_images: list[bytes], texts: list[bytes] | None = None) -> bytes:
    """One page per image: /Type /Page with an /XObject /Image resource
    (DCTDecode = the embedded JPEG), optionally with a text content
    stream too (mixed text+scan page)."""
    out = [b"%PDF-1.4\n"]
    num = 10
    for i, img in enumerate(page_images):
        img_num, content_num = num, num + 1
        page = (
            b"<< /Type /Page /Resources << /XObject << /Im0 %d 0 R >> >>"
            % img_num
        )
        if texts and texts[i]:
            out.append(_stream_obj(content_num, b"", texts[i]))
            page = (
                b"<< /Type /Page /Contents %d 0 R /Resources "
                b"<< /XObject << /Im0 %d 0 R >> >> >>"
                % (content_num, img_num)
            )
        else:
            page += b" >>"
        out.append(
            _stream_obj(
                img_num,
                b"/Subtype /Image /Filter /DCTDecode /Width 1 /Height 1",
                img,
            )
        )
        out.append(_obj(num + 2, page))
        num += 3
    out.append(b"%%EOF\n")
    return b"".join(out)


def test_scanned_pdf_yields_media_spans(spark, tmp_path):
    # the scanned-PDF path: pages that are one embedded JPEG and no text
    # layer must parse to MEDIA spans (not error rows, not a skip), with
    # the bytes served by pdf_media_table under the same pdfimg:// ref
    import numpy as np

    from agentic_doc_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_progressive_jpeg,
    )
    from agentic_doc_spark.pipeline import extract
    from agentic_doc_spark.sources.layout import layout_parse, pdf_media_table
    from agentic_doc_spark.sources.resolve import read_binary_dir

    arr = ((np.arange(24 * 32 * 3) * 7) % 256).astype(np.uint8).reshape(24, 32, 3)
    jpegs = [encode_jpeg(arr, quality=90), encode_progressive_jpeg(arr, quality=90)]
    (tmp_path / "scan.pdf").write_bytes(_scanned_pdf(jpegs))
    raw = read_binary_dir(spark, str(tmp_path))
    parsed = extract(layout_parse(raw)).collect()[0]
    spans = parsed["spans"]
    assert [s["kind"] for s in spans] == ["media", "media"]
    refs = [s["media_ref"] for s in spans]
    assert all(r and r.startswith("pdfimg://") for r in refs)
    assert parsed["errors"] == []
    media = {r["media_ref"]: r for r in pdf_media_table(raw).collect()}
    assert sorted(media) == sorted(refs)
    for i, ref in enumerate(sorted(media)):
        row = media[ref]
        assert row["page"] in (0, 1)
        decoded = decode_jpeg(bytes(row["content"]))
        assert decoded.shape == (24, 32, 3)


def test_mixed_text_and_scan_pdf_interleaves(spark, tmp_path):
    import numpy as np

    from agentic_doc_spark.functions.jpeg import encode_jpeg
    from agentic_doc_spark.sources.layout import layout_parse
    from agentic_doc_spark.sources.resolve import read_binary_dir

    arr = np.full((8, 8, 3), 200, dtype=np.uint8)
    pdf = _scanned_pdf(
        [encode_jpeg(arr)], texts=[b"BT (Caption text) Tj ET"]
    )
    (tmp_path / "mixed.pdf").write_bytes(pdf)
    raw = read_binary_dir(spark, str(tmp_path))
    row = layout_parse(raw).collect()[0]
    spans = row["spans"]
    # text block first, media span after it (same page)
    assert [s["text"] for s in spans] == ["Caption text", ""]
    assert spans[0]["media_ref"] is None
    assert spans[1]["media_ref"] == f"pdfimg://{row['doc_id']}/0"
