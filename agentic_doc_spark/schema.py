"""Canonical Spark schemas for the extraction engine.

Maps the reference's Pydantic data model (agentic_doc/common.py:22-161)
onto Spark StructTypes per SURVEY.md §1.1. These are the ONLY schema
definitions in the engine — every stage imports from here.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input side: documents_raw (BASELINE.json input_hint — exact shape)
# ---------------------------------------------------------------------------

#: One interleaved span. ``kind`` carries the reference ChunkType vocabulary
#: (text|table|figure|marginalia, agentic_doc/common.py:22-26) plus 'media'
#: for pure media spans and 'raw' for unclassified input; ``offset`` is the
#: dense 0-based in-document position.
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCUMENTS_RAW = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN)),
    ]
)

# ---------------------------------------------------------------------------
# Output side: ParsedDocument equivalents (agentic_doc/common.py:29-139)
# ---------------------------------------------------------------------------

#: ChunkGroundingBox — normalized [0,1] coords [left, top, right, bottom]
#: (agentic_doc/common.py:29-39).
BOX = T.StructType(
    [
        T.StructField("l", T.DoubleType()),
        T.StructField("t", T.DoubleType()),
        T.StructField("r", T.DoubleType()),
        T.StructField("b", T.DoubleType()),
    ]
)

#: ChunkGrounding (agentic_doc/common.py:42-46).
GROUNDING = T.StructType(
    [
        T.StructField("page", T.IntegerType()),
        T.StructField("box", BOX),
        T.StructField("image_path", T.StringType()),
    ]
)

#: Chunk (agentic_doc/common.py:49-53).
CHUNK = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("grounding", T.ArrayType(GROUNDING)),
        T.StructField("chunk_type", T.StringType()),
        T.StructField("chunk_id", T.StringType()),
    ]
)

#: PageError (agentic_doc/common.py:56-59).
PAGE_ERROR = T.StructType(
    [
        T.StructField("page_num", T.IntegerType()),
        T.StructField("error", T.StringType()),
        T.StructField("error_code", T.IntegerType()),
    ]
)

#: ParsedDocument as one row (agentic_doc/common.py:129-139). ``spans`` is
#: the flattened, order-dense output sequence used by the span-equality gate.
PARSED_DOCUMENT = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("markdown", T.StringType()),
        T.StructField("chunks", T.ArrayType(CHUNK)),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("start_page_idx", T.IntegerType()),
        T.StructField("end_page_idx", T.IntegerType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("errors", T.ArrayType(PAGE_ERROR)),
    ]
)

#: MetadataType[T] leaf wrapper (agentic_doc/common.py:66-69): every leaf of
#: a user extraction schema becomes STRUCT<value T, chunk_references
#: ARRAY<STRING>, confidence DOUBLE> — see operators/extraction.py.

# ---------------------------------------------------------------------------
# Lineage / metrics table (north rule; FIXTURES.md §5)
# ---------------------------------------------------------------------------

EXTRACTION_METRICS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("input_snapshot_id", T.StringType()),
        T.StructField("doc_ids_completed", T.ArrayType(T.StringType())),
        T.StructField("span_count", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

#: Media side table (FIXTURES.md §4).
MEDIA_REFS = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bbox", BOX),
    ]
)

#: Valid chunk-kind vocabulary after classification.
CHUNK_KINDS = ("text", "table", "figure", "marginalia", "media")
