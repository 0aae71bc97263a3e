"""Layout parse: raw document bytes → (doc_id, spans).

The reference obtains layout from its remote API; the north rule replaces
that with local parsing. This module implements the text-family decoders
for real (plain text, markdown, HTML — blank-line block segmentation, the
classic layout heuristic), and leaves PDF/image raster decoding behind the
same deterministic stub boundary as operators/multimodal.py (no PDF/image
libraries ship in this container; the kernel signature, schema, and
batching are production-shaped).

Everything is one mapInPandas kernel over binaryFile rows: bytes decode
and block splitting are bulk per-document work, vectorized where pandas
allows; span structs are emitted as flat rows and re-assembled to arrays
by collect_list ONLY if the caller wants the nested shape — the flat form
feeds pipeline/extract directly.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: blank-line block splitter (one or more empty lines)
_BLOCK_RE = re.compile(r"\n\s*\n+")
#: HTML block-level boundaries we convert to blank lines before splitting
_HTML_BLOCK_RE = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|section|article)[^>]*>",
    re.IGNORECASE,
)
_SCRIPT_RE = re.compile(
    r"<(script|style)[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)

_SPANS_FLAT = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)


def split_blocks(data: bytes, doc_type: str) -> list[str]:
    """bytes → ordered text blocks.

    PDFs go through the pure-stdlib text-layer extractor
    (sources/pdf_text.py — handles Flate/plain content streams of simple
    generators like the reference's reportlab fixtures); a PDF with no
    extractable text layer raises the documented stub boundary."""
    if doc_type == "pdf":
        from agentic_doc_spark.sources.pdf_text import extract_pdf_blocks

        blocks = [t for _, t in extract_pdf_blocks(data)]
        if not blocks:
            raise NotImplementedError(
                "no extractable text layer (scanned/encrypted/composite "
                "PDF) — rasterizing needs a PDF library not present in "
                "this container; supply (doc_id, spans) corpora instead"
            )
        return blocks
    text = data.decode("utf-8", errors="replace")
    if doc_type == "html":
        text = _SCRIPT_RE.sub(" ", text)
        text = _HTML_BLOCK_RE.sub("\n\n", text)
    blocks = [b.strip() for b in _BLOCK_RE.split(text)]
    return [b for b in blocks if b]


def layout_parse(binary_df: DataFrame) -> DataFrame:
    """(doc_id, content BINARY, doc_type) → documents_raw (doc_id, spans).

    Emits 'raw' kinds — classification happens in the extract kernel, so
    the span stream composes with the rest of the pipeline unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, texts, offs = [], [], [], []
            for doc_id, content, dt in zip(
                pdf["doc_id"], pdf["content"], pdf["doc_type"]
            ):
                is_html = dt == "image" and bytes(content[:1]) == b"<"
                try:
                    blocks = split_blocks(
                        bytes(content), "html" if is_html or dt == "html" else dt
                    )
                except NotImplementedError as ex:
                    # A document that reaches the parser but cannot be
                    # decoded is a PARSE failure, not a download failure:
                    # emit a one-span corrupt marker so extract produces
                    # the reference's failed-part shape — empty spans +
                    # per-page error rows (agentic_doc/parse.py:722-739,
                    # pinned by reference tests/unit/test_parse.py:473-501)
                    # — instead of the document silently vanishing. (The
                    # skip-silently precedent, parse.py:183-190, covers
                    # download failures only.)
                    ids.append(doc_id)
                    kinds.append("corrupt")
                    texts.append(f"undecodable document: {ex}")
                    offs.append(0)
                    continue
                ids.extend([doc_id] * len(blocks))
                kinds.extend(["raw"] * len(blocks))
                texts.extend(blocks)
                offs.extend(range(len(blocks)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "kind": kinds,
                    "text": texts,
                    "media_ref": [None] * len(ids),
                    "offset": offs,
                }
            )

    flat = binary_df.mapInPandas(run, _SPANS_FLAT)
    # sort key must lead the struct (sort_array orders by field position)
    ordered = F.sort_array(
        F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
    )
    spans = F.transform(
        ordered,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return flat.groupBy("doc_id").agg(spans.alias("spans"))


def route_doc_types(raw: DataFrame) -> DataFrame:
    """Route html by extension (the magic sniff only separates pdf from
    the rest; the kernel additionally content-sniffs leading '<')."""
    return raw.withColumn(
        "doc_type",
        F.when(F.col("doc_id").rlike(r"(?i)\.html?$"), "html").otherwise(
            F.col("doc_type")
        ),
    )


def ingest_directory(spark, path: str, **options) -> DataFrame:
    """End-to-end file ingest: dir scan (S2) → sniff (P1) → layout parse →
    documents_raw, ready for pipeline.extract. Handles text/markdown/HTML
    natively and text-layer PDFs via sources/pdf_text.py; undecodable
    documents become failed-part error documents (empty spans, per-page
    error rows) downstream."""
    from agentic_doc_spark.sources.resolve import read_binary_dir

    return layout_parse(route_doc_types(read_binary_dir(spark, path, **options)))
