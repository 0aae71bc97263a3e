"""User-facing API: the reference's ``parse(...)`` surface on Spark.

Signature parity with agentic_doc.parse.parse (agentic_doc/parse.py:49-67):
a user of the reference switches by passing a SparkSession and receiving a
DataFrame of ParsedDocument rows instead of a list of Pydantic objects.

Precedence mirrors the reference (config > kwargs > defaults,
agentic_doc/parse.py:93-101; pinned by tests/unit/test_parse.py:1696-1951);
the extraction_model/extraction_schema mutual-exclusion guard is U5
(parse.py:119-122).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from agentic_doc_spark.config import DEFAULT_SETTINGS, Settings
from agentic_doc_spark.operators.extraction import (
    extraction_page_guard,
    validate_extraction,
)
from agentic_doc_spark.pipeline import extract
from agentic_doc_spark.sources.resolve import DocumentsInput, resolve


def parse(
    spark: SparkSession,
    documents: DocumentsInput,
    *,
    include_marginalia: bool | None = None,
    include_metadata_in_markdown: bool | None = None,
    result_save_dir: str | None = None,
    result_format: str = "parquet",
    grounding_save_dir: str | None = None,
    page_rasters: DataFrame | None = None,
    render_groundings: bool = True,
    connector_path: str | None = None,
    connector_pattern: str | None = None,
    extraction_model: T.StructType | None = None,
    extraction_schema: str | None = None,
    extraction_payload_col: str = "extraction_payload",
    extraction_metadata_col: str | None = None,
    config: Settings | None = None,
) -> DataFrame:
    """Parse documents into ParsedDocument rows.

    - ``documents``: DataFrame / parquet path / directory / bytes / list
      (S1 dispatch, sources/resolve.py).
    - ``extraction_model``: StructType schema (the Pydantic-model analog);
      ``extraction_schema``: DDL/JSON-schema string. Mutually exclusive
      (U5, agentic_doc/parse.py:119-122).
    - ``result_save_dir``: when set, results are also written there and
      the same DataFrame is returned (reference entry point 3,
      parse.py:325-367). ``result_format="parquet"`` appends a table;
      ``"json"`` writes the reference's per-document JSON export
      (timestamped result_name, parse.py:453-467) readable back via
      ``sinks.read_parsed_json``.
    - ``grounding_save_dir``: populate ``grounding.image_path`` AND write
      the crop PNGs there (reference parse.py:441-448 + utils.py:63-169);
      ``page_rasters`` supplies renderer output (doc_id, page, content),
      else pages are synthesized deterministically from the layout;
      ``render_groundings=False`` attaches paths only.
    - ``config``: full Settings object; wins over keyword flags
      (reference precedence, parse.py:93-101).
    """
    if extraction_model is not None and extraction_schema is not None:
        raise ValueError(
            "extraction_model and extraction_schema are mutually exclusive"
        )
    if result_format not in ("parquet", "json"):
        raise ValueError(
            f"result_format must be 'parquet' or 'json', got {result_format!r}"
        )

    settings = config or DEFAULT_SETTINGS
    overrides: dict[str, Any] = {}
    if config is None:
        if include_marginalia is not None:
            overrides["include_marginalia"] = include_marginalia
        if include_metadata_in_markdown is not None:
            overrides["include_metadata_in_markdown"] = include_metadata_in_markdown
    if overrides:
        settings = replace(settings, **overrides)

    persisted: DataFrame | None = None
    df = resolve(
        spark,
        documents,
        **(
            {"pattern": connector_pattern}
            if connector_pattern and not isinstance(documents, DataFrame)
            else {}
        ),
    )
    if connector_path and not isinstance(documents, DataFrame):
        df = resolve(spark, connector_path, pattern=connector_pattern)

    binary_routed = None
    if "spans" not in df.columns:
        # raw-binary corpus (directory / bytes / path list): run the
        # layout-parse stage — txt/md/HTML and text-layer PDFs decode for
        # real (sources/layout.py, sources/pdf_text.py); undecodable
        # documents are skipped, not fatal (R6, reference parse.py:183-190)
        from agentic_doc_spark.sources.layout import layout_parse, route_doc_types

        binary_routed = route_doc_types(df)
        df = layout_parse(binary_routed, settings)

    parsed = extract(df, settings)

    if grounding_save_dir:
        # reference behavior: image_path is populated ONLY when a
        # grounding save dir is given (agentic_doc/parse.py:441-448),
        # and the crop PNGs are written there
        # (save_groundings_as_images, utils.py:63-169). ``page_rasters``
        # (doc_id, page, content) supplies real page images when the
        # caller has a renderer; otherwise rasterize_pages synthesizes
        # deterministic layout pages so the loop closes in-engine.
        from agentic_doc_spark.operators.multimodal import (
            attach_grounding_image_paths,
            rasterize_pages,
            render_grounding_crops,
            write_grounding_images,
        )

        parsed = attach_grounding_image_paths(parsed, grounding_save_dir)
        if render_groundings:
            # the render job consumes `parsed` on BOTH join sides (crop
            # specs and synthesized rasters), and a result_save_dir write
            # may follow — persist across parse()'s eager actions so
            # extract() runs once, not once per consumer; ALWAYS released
            # (try/finally below) so a failed write cannot pin the cached
            # corpus for the driver's lifetime
            persisted = parsed = parsed.persist()
            pages = page_rasters
            if pages is None and binary_routed is not None:
                # raster DOCUMENTS (scanned TIFF/PNG/JPEG/... files)
                # have REAL page images — use them for crops; all other
                # (doc, page)s fall back to the synthesized layout pages
                from pyspark.sql import functions as F

                from agentic_doc_spark.sources.layout import (
                    image_media_table,
                )

                # decodable-only: an undecodable real page (WebP, a
                # CCITT TIFF page) must NOT anti-join away the doc's
                # synthesized fallback pages — image_path would then
                # point at crop files that are never written
                real = (
                    image_media_table(binary_routed)
                    .filter(F.col("decodable"))
                    .select("doc_id", "page", "content")
                )
                # per-PAGE anti-join: a doc whose page 1 is undecodable
                # keeps its synthesized page 1 while page 0 crops come
                # from the real scan (crop rects scale to either size)
                synth_pages = rasterize_pages(parsed).join(
                    real.select("doc_id", "page"),
                    ["doc_id", "page"],
                    "left_anti",
                )
                pages = real.unionByName(synth_pages)
            elif pages is None:
                pages = rasterize_pages(parsed)
            try:
                write_grounding_images(
                    render_grounding_crops(parsed, pages), grounding_save_dir
                )
            except BaseException:
                persisted.unpersist()
                raise

    try:
        return _finish_parse(
            df,
            parsed,
            settings,
            extraction_model,
            extraction_schema,
            extraction_payload_col,
            extraction_metadata_col,
            result_save_dir,
            result_format,
        )
    finally:
        if persisted is not None:
            persisted.unpersist()


def _finish_parse(
    df: DataFrame,
    parsed: DataFrame,
    settings: Settings,
    extraction_model,
    extraction_schema,
    extraction_payload_col: str,
    extraction_metadata_col: str | None,
    result_save_dir: str | None,
    result_format: str,
) -> DataFrame:
    """parse()'s tail: extraction validation + result export (split out
    so the persist released in parse()'s finally covers every eager
    action here)."""
    schema = extraction_model or extraction_schema
    if schema is not None:
        if (
            extraction_metadata_col is not None
            and extraction_metadata_col not in df.columns
        ):
            # silently ignoring a missing metadata column would drop the
            # user's requested extraction_metadata with no signal
            raise ValueError(
                f"extraction_metadata_col {extraction_metadata_col!r} is not "
                f"a column of the input (columns: {df.columns})"
            )
        if extraction_payload_col in df.columns:
            cols = ["doc_id", extraction_payload_col]
            md_col = extraction_metadata_col
            if md_col:
                cols.append(md_col)
            payloads = df.select(*cols)
            parsed = parsed.join(payloads, "doc_id", "left")
            parsed = validate_extraction(
                parsed, extraction_payload_col, schema, metadata_col=md_col
            )
            parsed = parsed.drop(extraction_payload_col)
            if md_col:
                parsed = parsed.drop(md_col)
            if settings.include_metadata_in_markdown:
                # P3/F9: embed the extracted fields as a markdown table
                from pyspark.sql import functions as F

                from agentic_doc_spark.functions.markdown import (
                    append_metadata_to_markdown,
                )

                st = (
                    T._parse_datatype_string(schema)
                    if isinstance(schema, str)
                    else schema
                )
                parsed = parsed.withColumn(
                    "markdown",
                    append_metadata_to_markdown(
                        F.col("markdown"), F.col("extraction"), st
                    ),
                )
        else:
            # no payload column: extraction is NULL but typed as the SAME
            # struct the payload path produces — one query, one dtype,
            # whether or not the input carried payloads
            from pyspark.sql import functions as F

            from agentic_doc_spark.operators.extraction import metadata_schema

            st = (
                T._parse_datatype_string(schema)
                if isinstance(schema, str)
                else schema
            )
            parsed = parsed.withColumn(
                "extraction", F.lit(None).cast(st)
            ).withColumn("extraction_error", F.lit(None).cast("string"))
            if extraction_metadata_col is not None:
                parsed = parsed.withColumn(
                    "extraction_metadata",
                    F.lit(None).cast(metadata_schema(st)),
                )
        parsed = extraction_page_guard(parsed, settings.extraction_split_size)

    if result_save_dir:
        if result_format == "json":
            # reference entry point 3 writes per-doc timestamped JSON
            # results (parse.py:453-467); read back via
            # sinks.read_parsed_json
            from agentic_doc_spark.sources.sinks import write_json_results

            write_json_results(parsed, result_save_dir)
        else:
            parsed.write.mode("append").parquet(result_save_dir)
    return parsed


def parse_documents(
    spark: SparkSession, documents: Iterable, **kwargs: Any
) -> DataFrame:
    """Legacy entry-point parity: parse a LIST of documents
    (agentic_doc.parse.parse_documents, parse.py:260-267 — same keyword
    surface as parse(); the list routes through the S1 dispatch)."""
    if isinstance(documents, (str, bytes)):
        # list('docs/') would explode into per-character paths
        raise TypeError(
            "parse_documents expects a list of paths — pass a single "
            "path/bytes input to parse() instead"
        )
    return parse(spark, list(documents), **kwargs)


def parse_and_save_documents(
    spark: SparkSession,
    documents: DocumentsInput,
    *,
    result_save_dir: str,
    **kwargs: Any,
) -> DataFrame:
    """Legacy entry-point parity (parse.py:325-335): parse and ALWAYS
    save results to ``result_save_dir``. The reference returns the
    written paths; here the parsed DataFrame returns (the save dir holds
    the table / per-doc JSON depending on ``result_format``)."""
    return parse(spark, documents, result_save_dir=result_save_dir, **kwargs)


def parse_and_save_document(
    spark: SparkSession, document: DocumentsInput, **kwargs: Any
) -> DataFrame:
    """Legacy single-document entry point (parse.py:396-406): same
    semantics as parse() over one input."""
    return parse(spark, document, **kwargs)
