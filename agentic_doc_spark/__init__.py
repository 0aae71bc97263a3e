"""agentic_doc_spark — a from-scratch PySpark-native document-extraction engine.

Re-expresses the capabilities of the reference client library
(``agentic-doc``, see /root/reference) as an idiomatic Spark DataFrame
pipeline over a corpus of interleaved text+media documents::

    documents_raw(doc_id STRING,
                  spans ARRAY<STRUCT<kind, text, media_ref, offset>>)

Core invariant (the correctness gate): per-document span-sequence equality
``(kind, text, media_ref, order)`` against the reference's merge/ordering
semantics (reference: agentic_doc/parse.py:597-629).

Subpackages
-----------
- ``schema``     canonical StructTypes (SURVEY.md §1)
- ``synth``      deterministic fixture corpus generator (FIXTURES.md)
- ``pipeline``   the 6-stage extraction pipeline (SURVEY.md §3)
- ``operators``  split/merge/errors/extraction/lineage/dedup/similarity
- ``functions``  scalar kernels: classify, boilerplate strip, text stats,
                 geometry, ids
- ``sources``    input resolution + connectors + sinks (SURVEY.md §2.1)
- ``streaming``  Structured Streaming variant of the pipeline
"""

__version__ = "0.1.0"
