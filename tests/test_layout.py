"""Layout parse: bytes → spans → full pipeline, end to end from files."""

from __future__ import annotations

import pytest

from agentic_doc_spark.pipeline import extract
from agentic_doc_spark.sources.layout import ingest_directory, split_blocks


TXT = b"""First paragraph of the document.

Second paragraph with more words.


Third block after extra blank lines.
"""

HTML = b"""<html><head><style>p { color: red }</style></head><body>
<nav><a href='/'>home</a><a href='/x'>about</a></nav>
<h1>Title here</h1><p>Body paragraph one.</p><p>Body paragraph two.</p>
<footer>\xc2\xa9 2024 Example Corp - All rights reserved</footer>
</body></html>"""


def test_split_blocks_text():
    blocks = split_blocks(TXT, "text")
    assert blocks == [
        "First paragraph of the document.",
        "Second paragraph with more words.",
        "Third block after extra blank lines.",
    ]


def test_split_blocks_html_segments_on_block_tags():
    blocks = split_blocks(HTML, "html")
    joined = " | ".join(blocks)
    assert "Title here" in joined
    assert "Body paragraph one." in joined
    assert "color: red" not in joined  # style stripped


def test_split_blocks_pdf_is_stubbed():
    with pytest.raises(NotImplementedError):
        split_blocks(b"%PDF-1.7 ...", "pdf")


def test_ingest_directory_end_to_end(spark, tmp_path):
    (tmp_path / "a.txt").write_bytes(TXT)
    (tmp_path / "b.html").write_bytes(HTML)
    raw = ingest_directory(spark, str(tmp_path))
    parsed = {r["doc_id"].split("/")[-1]: r.asDict(recursive=True)
              for r in extract(raw).collect()}
    a = parsed["a.txt"]
    assert [s["text"] for s in a["spans"]] == [
        "First paragraph of the document.",
        "Second paragraph with more words.",
        "Third block after extra blank lines.",
    ]
    assert a["markdown"].startswith("First paragraph")
    b = parsed["b.html"]
    texts = " ".join(s["text"] for s in b["spans"])
    # boilerplate stripped by the extract kernel
    assert "All rights reserved" not in texts
    assert "home" not in texts  # nav link soup dropped (link density)
    assert "Body paragraph one." in texts
