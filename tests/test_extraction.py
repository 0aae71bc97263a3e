"""U1-U3 extraction path: metadata-model synthesis + from_json validation
(reference semantics: agentic_doc/common.py:72-126, parse.py:689-716,
tests/unit/test_common.py:248-398, tests/unit/test_parse.py:1277-1457)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from agentic_doc_spark.operators.extraction import (
    extraction_page_guard,
    metadata_schema,
    resolve_chunk_references,
    validate_extraction,
)


def _leaf(vt):
    return T.StructType(
        [
            T.StructField("value", vt),
            T.StructField("chunk_references", T.ArrayType(T.StringType())),
            T.StructField("confidence", T.DoubleType()),
        ]
    )


def test_metadata_schema_flat():
    s = T.StructType(
        [T.StructField("name", T.StringType()), T.StructField("age", T.IntegerType())]
    )
    m = metadata_schema(s)
    assert m["name"].dataType == _leaf(T.StringType())
    assert m["age"].dataType == _leaf(T.IntegerType())


def test_metadata_schema_nested_and_lists():
    # mirrors create_metadata_model recursion cases (common.py:100-124)
    inner = T.StructType([T.StructField("city", T.StringType())])
    s = T.StructType(
        [
            T.StructField("address", inner),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("addresses", T.ArrayType(inner)),
        ]
    )
    m = metadata_schema(s)
    assert m["address"].dataType["city"].dataType == _leaf(T.StringType())
    assert m["tags"].dataType == T.ArrayType(_leaf(T.StringType()))
    assert m["addresses"].dataType.elementType["city"].dataType == _leaf(
        T.StringType()
    )


def test_validate_extraction(spark):
    schema = "name string, age int"
    rows = [
        ("d1", json.dumps({"name": "ann", "age": 3})),
        ("d2", "not json at all {{{"),
        ("d3", None),
        ("d4", json.dumps({"unrelated": 1})),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    got = {
        r["doc_id"]: r.asDict()
        for r in validate_extraction(df, "payload", schema).collect()
    }
    assert got["d1"]["extraction"]["name"] == "ann"
    assert got["d1"]["extraction_error"] is None
    # invalid → extraction None + error row, doc survives (parse.py:1417-1457)
    assert got["d2"]["extraction"] is None
    assert got["d2"]["extraction_error"] is not None
    assert got["d3"]["extraction"] is None and got["d3"]["extraction_error"] is None
    assert got["d4"]["extraction"] is None and got["d4"]["extraction_error"] is not None


def test_validate_extraction_missing_first_field(spark):
    # a valid payload missing only the FIRST schema field must be accepted
    # (regression: coalesce over isNotNull checks always returned the
    # first field's check, wrongly rejecting such payloads)
    schema = "name string, age int"
    df = spark.createDataFrame(
        [("d1", json.dumps({"age": 5}))], ["doc_id", "payload"]
    )
    r = validate_extraction(df, "payload", schema).collect()[0]
    assert r["extraction"]["age"] == 5
    assert r["extraction"]["name"] is None
    assert r["extraction_error"] is None


def test_validate_extraction_metadata(spark):
    schema = "total double"
    md = json.dumps(
        {"total": {"value": 12.5, "chunk_references": ["c1", "c2"], "confidence": 0.9}}
    )
    df = spark.createDataFrame(
        [("d1", json.dumps({"total": 12.5}), md)], ["doc_id", "payload", "md"]
    )
    r = validate_extraction(df, "payload", schema, metadata_col="md").collect()[0]
    assert r["extraction_metadata"]["total"]["chunk_references"] == ["c1", "c2"]
    assert r["extraction_metadata"]["total"]["confidence"] == 0.9


def test_extraction_page_guard(spark):
    df = spark.createDataFrame(
        [("small", 0, 9), ("big", 0, 99)],
        ["doc_id", "start_page_idx", "end_page_idx"],
    )
    got = {
        r["doc_id"]: r["extraction_error"]
        for r in extraction_page_guard(df, 50).collect()
    }
    assert got["small"] is None
    assert "extraction_split_size" in got["big"]


def test_resolve_chunk_references(spark):
    refs = spark.createDataFrame(
        [("d1", "total", ["c1", "c2"])], ["doc_id", "field", "chunk_references"]
    )
    chunks = spark.createDataFrame(
        [("d1", "c1", "text one"), ("d1", "c2", "text two")],
        ["doc_id", "chunk_id", "text"],
    )
    got = resolve_chunk_references(refs, chunks).orderBy("chunk_id").collect()
    assert [(r["chunk_id"], r["text"]) for r in got] == [
        ("c1", "text one"),
        ("c2", "text two"),
    ]
