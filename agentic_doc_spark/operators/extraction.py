"""Schema-driven field extraction (SURVEY.md §2.9, U1-U5).

The reference validates an API-returned ``extracted_schema`` dict against a
user Pydantic model / JSON schema (agentic_doc/parse.py:689-716) and
synthesizes a parallel "metadata model" whose every leaf is
MetadataType[T] = {value, chunk_references, confidence}
(agentic_doc/common.py:72-126). Here:

- the user schema is a Spark StructType (or DDL string);
- validation = ``from_json`` with FAILFAST-free null-out semantics: an
  unparsable/ill-typed payload yields extraction=NULL plus an
  extraction_error string (mirrors tests/unit/test_parse.py:1277-1332,
  :1417-1457 — invalid extraction does not abort the document);
- ``metadata_schema`` is the StructType twin of create_metadata_model.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: MetadataType[VT] leaf wrapper (agentic_doc/common.py:66-69).


def _metadata_leaf(vt: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("value", vt),
            T.StructField("chunk_references", T.ArrayType(T.StringType())),
            T.StructField("confidence", T.DoubleType()),
        ]
    )


def metadata_schema(schema: T.StructType) -> T.StructType:
    """StructType twin of create_metadata_model (common.py:72-126):
    recursively replace every leaf type VT with MetadataType[VT].

    - nested struct → recurse (common.py:115-117)
    - array<struct> → array<recurse> (common.py:100-106)
    - array<leaf>   → array<MetadataType[leaf]> (common.py:107-111)
    - leaf          → MetadataType[leaf] (common.py:119-124)
    """
    fields = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.StructType):
            new: T.DataType = metadata_schema(dt)
        elif isinstance(dt, T.ArrayType):
            inner = dt.elementType
            if isinstance(inner, T.StructType):
                new = T.ArrayType(metadata_schema(inner))
            else:
                new = T.ArrayType(_metadata_leaf(inner))
        else:
            new = _metadata_leaf(dt)
        fields.append(T.StructField(f.name, new, True))
    return T.StructType(fields)


def validate_extraction(
    df: DataFrame,
    payload_col: str,
    extraction_schema: T.StructType | str,
    metadata_col: str | None = None,
) -> DataFrame:
    """U1/U2: validate a JSON extraction payload column against the user
    schema. Adds:

    - ``extraction``        struct (NULL when invalid)
    - ``extraction_metadata`` metadata-struct (when metadata_col given)
    - ``extraction_error``  string (NULL when valid)

    A payload is invalid when it is non-NULL but fails to parse as the
    schema, or when any REQUIRED top-level field is missing — matching
    the reference's validate-or-error-row behavior
    (agentic_doc/parse.py:697-706). Pure from_json — no UDF."""
    schema = (
        T._parse_datatype_string(extraction_schema)
        if isinstance(extraction_schema, str)
        else extraction_schema
    )
    payload = F.col(payload_col)
    parsed = F.from_json(payload, schema)  # malformed → NULL
    # from_json returns a struct of NULLs for type-mismatched fields; treat
    # "payload present but nothing parsed" as invalid. OR the per-field
    # checks (isNotNull never returns NULL, so coalesce would always pick
    # the FIRST field's check and reject payloads missing only that field)
    any_field = functools.reduce(
        operator.or_,
        [parsed[f.name].isNotNull() for f in schema.fields],
        F.lit(False),
    )
    valid = payload.isNotNull() & parsed.isNotNull() & any_field
    out = df.withColumn(
        "extraction", F.when(valid, parsed)
    ).withColumn(
        "extraction_error",
        F.when(payload.isNotNull() & ~valid, F.lit("extraction schema validation failed")),
    )
    if metadata_col is not None:
        md_schema = metadata_schema(schema)
        md_parsed = F.from_json(F.col(metadata_col), md_schema)
        out = out.withColumn(
            "extraction_metadata", F.when(valid, md_parsed)
        )
    return out


def extraction_page_guard(
    parsed: DataFrame, extraction_split_size: int = 50
) -> DataFrame:
    """X2: with extraction enabled, docs whose page count exceeds
    extraction_split_size get extraction_error instead of extraction
    (agentic_doc/parse.py:483-498)."""
    too_big = (F.col("end_page_idx") - F.col("start_page_idx") + 1) > F.lit(
        extraction_split_size
    )
    cols = parsed.columns
    out = parsed
    msg = F.lit(
        f"document exceeds extraction_split_size={extraction_split_size} pages"
    )
    if "extraction" in cols:
        out = out.withColumn(
            "extraction", F.when(too_big, F.lit(None)).otherwise(F.col("extraction"))
        )
    out = out.withColumn(
        "extraction_error",
        F.when(too_big, msg).otherwise(
            F.col("extraction_error") if "extraction_error" in cols else F.lit(None)
        ),
    )
    return out


def resolve_chunk_references(
    metadata_refs: DataFrame, chunks: DataFrame
) -> DataFrame:
    """J1: provenance join — explode chunk_references and resolve each to
    its source chunk (reference get_chunk_from_reference,
    agentic_doc/utils.py:127-128). The chunk side is hinted broadcast:
    per-doc chunk tables are small dimensions next to the reference fact
    side."""
    refs = metadata_refs.select(
        "doc_id", "field", F.explode("chunk_references").alias("chunk_id")
    )
    return refs.join(F.broadcast(chunks), ["doc_id", "chunk_id"], "left")
