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


def test_split_blocks_property_random_text():
    # property: for ANY text assembled from words + blank-line separators,
    # split_blocks returns exactly the non-empty stripped segments, in order
    import random

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "x1", "42"]
    for _ in range(200):
        blocks = [
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(0, 8))
        ]
        seps = [
            "\n" + " " * rng.randint(0, 2) + "\n" * rng.randint(1, 3)
            for _ in range(len(blocks) + 1)
        ]
        text = seps[0] + "".join(b + s for b, s in zip(blocks, seps[1:]))
        got = split_blocks(text.encode(), "text")
        assert got == blocks, text


def test_split_blocks_html_tag_soup_order():
    # block tags of any flavor become separators; inline tags do not split;
    # script/style bodies vanish entirely
    html = (
        "<div>one <b>bold</b> piece</div>"
        "<script>var x = 'SECRET';</script>"
        "<ul><li>item a</li><li>item b</li></ul>"
        "<style>.c{color:blue}</style>"
        "<h2>final heading</h2>"
    )
    got = split_blocks(html.encode(), "html")
    assert got == [
        "one <b>bold</b> piece",
        "item a",
        "item b",
        "final heading",
    ]


def test_html_table_to_markdown_span(spark, tmp_path):
    # DOM heuristic: a <table> converts to ONE markdown pipe-table span
    # and classifies as kind 'table' (the reference's table chunks,
    # agentic_doc/common.py:22-26)
    from agentic_doc_spark.pipeline import extract
    from agentic_doc_spark.sources.layout import ingest_directory, split_blocks

    html = (
        b"<html><body><p>intro paragraph</p>"
        b"<table><tr><th>name</th><th>qty</th></tr>"
        b"<tr><td>bolt</td><td>12</td></tr>"
        b"<tr><td>nut</td><td>7</td></tr></table>"
        b"<p>closing words</p></body></html>"
    )
    blocks = split_blocks(html, "html")
    assert blocks == [
        "intro paragraph",
        "| name | qty |\n| bolt | 12 |\n| nut | 7 |",
        "closing words",
    ]
    (tmp_path / "t.html").write_bytes(html)
    parsed = extract(ingest_directory(spark, str(tmp_path))).collect()[0]
    kinds = [
        c["chunk_type"] for c in parsed["chunks"]
    ]
    assert kinds == ["text", "table", "text"]
    assert "| bolt | 12 |" in parsed["markdown"]
