"""The Arrow engine: zero-shuffle per-document extraction via mapInArrow.

``documents_raw`` already holds ONE ROW PER DOCUMENT, so the whole
reference pipeline — classify, boilerplate strip, part split, per-part
failure, ordered merge (agentic_doc/parse.py:472-629) — is row-local.
The two-level shuffle pipeline (pipeline.py) exists because the reference
splits documents to satisfy an external API's page limits; with local
compute the split/merge is pure arithmetic inside the row, and the
DataFrame plan needs NO exchange at all:

    scan → mapInArrow(extract_batch) → sink

Inside the kernel everything is columnar: pyarrow ListArrays flatten to
flat numpy/pandas columns, the classify contract runs the SAME
classify_frame as the shuffle engine, per-part failure and markdown
assembly are vectorized groupby/join ops, and the nested output
(spans/chunks/errors ListArray<StructArray>) is rebuilt directly from
flat arrays + offsets — zero per-row Python objects end to end, which is
the north rule's execution constraint taken literally.

Scale: parallelism = scan splits (a 100 TB corpus has ~10^6 of them);
each Arrow batch is bounded by maxRecordsPerBatch; a mega-document is a
single large row — 1000 pages ≈ 4k spans ≈ a few hundred KB, far below
batch limits. Because Python workers share nothing, throughput scales
with cores/executors linearly (no shuffle, no JVM allocation pressure).

Equivalence with pipeline.extract is pinned by running the full
span-equality fixture suite over BOTH engines (tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame

from agentic_doc_spark.config import DEFAULT_SETTINGS, Settings
from agentic_doc_spark.functions.classify import classify_frame
from agentic_doc_spark.functions.markdown import PART_SEP

_OUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("markdown", pa.string()),
        pa.field(
            "chunks",
            pa.list_(
                pa.struct(
                    [
                        pa.field("text", pa.string()),
                        pa.field(
                            "grounding",
                            pa.list_(
                                pa.struct(
                                    [
                                        pa.field("page", pa.int32()),
                                        pa.field(
                                            "box",
                                            pa.struct(
                                                [
                                                    pa.field("l", pa.float64()),
                                                    pa.field("t", pa.float64()),
                                                    pa.field("r", pa.float64()),
                                                    pa.field("b", pa.float64()),
                                                ]
                                            ),
                                        ),
                                        pa.field("image_path", pa.string()),
                                    ]
                                )
                            ),
                        ),
                        pa.field("chunk_type", pa.string()),
                        pa.field("chunk_id", pa.string()),
                    ]
                )
            ),
        ),
        pa.field(
            "spans",
            pa.list_(
                pa.struct(
                    [
                        pa.field("kind", pa.string()),
                        pa.field("text", pa.string()),
                        pa.field("media_ref", pa.string()),
                        pa.field("offset", pa.int32()),
                    ]
                )
            ),
        ),
        pa.field("start_page_idx", pa.int32()),
        pa.field("end_page_idx", pa.int32()),
        pa.field("doc_type", pa.string()),
        pa.field(
            "errors",
            pa.list_(
                pa.struct(
                    [
                        pa.field("page_num", pa.int32()),
                        pa.field("error", pa.string()),
                        pa.field("error_code", pa.int32()),
                    ]
                )
            ),
        ),
    ]
)


def _render(kind: np.ndarray, text: pd.Series, media: pd.Series) -> pd.Series:
    """Vectorized render_span twin (functions/markdown.py)."""
    text = text.fillna("")
    m = media.fillna("")
    out = text.copy()
    is_media = kind == "media"
    has_media = media.notna() & (media != "")
    is_fig = (kind == "figure") & has_media
    out[is_media] = "![" + m[is_media] + "](" + m[is_media] + ")"
    out[is_fig] = "![" + text[is_fig] + "](" + m[is_fig] + ")"
    return out


def extract_batch(
    batch: pa.RecordBatch, settings: Settings = DEFAULT_SETTINGS
) -> pa.RecordBatch:
    """One Arrow batch of documents → one batch of ParsedDocument rows."""
    spp, split = settings.spans_per_page, settings.split_size
    n_docs = batch.num_rows
    doc_ids = batch.column("doc_id").to_pandas()
    spans_col = batch.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()

    # --- flatten list<struct> to flat columns + per-span doc index -------
    lengths = np.asarray(
        pa.compute.list_value_length(spans_col).fill_null(0).to_numpy(
            zero_copy_only=False
        ),
        dtype=np.int64,
    )
    parent = np.repeat(np.arange(n_docs), lengths)
    flat = spans_col.flatten()
    pdf = pd.DataFrame(
        {
            "kind": flat.field("kind").to_pandas(),
            "text": flat.field("text").to_pandas(),
            "media_ref": flat.field("media_ref").to_pandas(),
            "offset": flat.field("offset").to_pandas(),
            "parent": parent,
        }
    )
    # tolerate garbage: null struct elements / null offsets are dropped
    # (the shuffle engine's explode_outer placeholder filter does the same)
    pdf = pdf[pdf["offset"].notna()]
    pdf["offset"] = pdf["offset"].astype("int64")
    # restore in-document order (offset may arrive unsorted)
    pdf = pdf.sort_values(["parent", "offset"], kind="stable").reset_index(
        drop=True
    )

    # --- classify + strip: the shared kernel contract --------------------
    pdf = classify_frame(pdf)
    pdf["page"] = np.floor_divide(pdf["offset"].to_numpy(), spp)
    pdf["part"] = np.floor_divide(pdf["page"].to_numpy(), split)

    # --- per-part failure (agentic_doc/parse.py:722-739) -----------------
    grp_part = pdf.groupby(["parent", "part"], sort=True)
    pdf["part_failed"] = grp_part["corrupt"].transform("max")

    keep = ~pdf["part_failed"]
    if settings.strip_boilerplate:
        keep &= pdf["keep"]
    if not settings.include_marginalia:
        keep &= pdf["kind_out"] != "marginalia"

    # failed-part error rows: one per page in the part's span range
    fr = grp_part.agg(
        failed=("part_failed", "max"),
        pg_lo=("page", "min"),
        pg_hi=("page", "max"),
    ).reset_index()
    fr = fr[fr["failed"]]
    if len(fr):
        counts = (fr["pg_hi"] - fr["pg_lo"] + 1).to_numpy(dtype=np.int64)
        err_parent = np.repeat(fr["parent"].to_numpy(), counts)
        err_page = np.concatenate(
            [np.arange(lo, hi + 1) for lo, hi in zip(fr["pg_lo"], fr["pg_hi"])]
        )
        order = np.argsort(err_parent, kind="stable")
        err_parent, err_page = err_parent[order], err_page[order]
    else:
        err_parent = np.empty(0, dtype=np.int64)
        err_page = np.empty(0, dtype=np.int64)

    # --- kept spans, ordered; dense output offsets -----------------------
    out = pdf[keep].copy()
    kind = out["kind_out"].to_numpy()
    new_off = out.groupby("parent").cumcount().to_numpy(dtype=np.int32)
    rendered = _render(kind, out["text"], out["media_ref"])

    # --- markdown: join spans within part, parts within doc --------------
    # failed/empty parts contribute '' and still get a separator
    # (parse.py:621 unconditional join): build the full part grid
    all_parts = (
        pdf.groupby(["parent", "part"], sort=True)
        .size()
        .reset_index()[["parent", "part"]]
    )
    out["_r"] = rendered
    part_md = out.groupby(["parent", "part"], sort=True)["_r"].agg(PART_SEP.join)
    grid = all_parts.set_index(["parent", "part"]).join(part_md.rename("md"))
    grid["md"] = grid["md"].fillna("")
    doc_md = grid.groupby(level="parent")["md"].agg(PART_SEP.join)
    markdown = pd.Series([""] * n_docs, dtype=object)
    markdown.loc[doc_md.index] = doc_md.to_numpy()

    # --- page range -------------------------------------------------------
    end_page = pdf.groupby("parent")["page"].max()
    end_page_idx = np.zeros(n_docs, dtype=np.int32)
    end_page_idx[end_page.index.to_numpy()] = np.maximum(
        end_page.to_numpy(), 0
    ).astype(np.int32)

    # --- build nested outputs straight from flat arrays -------------------
    def list_offsets(parents: np.ndarray) -> np.ndarray:
        counts = np.bincount(parents, minlength=n_docs)
        return np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)

    op = out["parent"].to_numpy()
    span_struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, pa.string()),
            pa.array(out["text"].to_numpy(dtype=object), pa.string()),
            pa.array(out["media_ref"].to_numpy(dtype=object), pa.string()),
            pa.array(new_off, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans_out = pa.ListArray.from_arrays(
        pa.array(list_offsets(op), pa.int32()), span_struct
    )

    h = 0.8 / spp
    src_off = out["offset"].to_numpy()
    t_raw = (src_off % spp) * h + 0.05
    box = pa.StructArray.from_arrays(
        [
            pa.array(np.full(len(out), 0.1), pa.float64()),
            pa.array(np.round(t_raw, 6), pa.float64()),
            pa.array(np.full(len(out), 0.9), pa.float64()),
            pa.array(np.round(t_raw + h - 0.01, 6), pa.float64()),
        ],
        names=["l", "t", "r", "b"],
    )
    pages32 = out["page"].to_numpy().astype(np.int32)
    grounding_struct = pa.StructArray.from_arrays(
        [
            pa.array(pages32, pa.int32()),
            box,
            pa.array([None] * len(out), pa.string()),
        ],
        names=["page", "box", "image_path"],
    )
    # exactly one grounding per chunk: offsets 0..n
    ground_list = pa.ListArray.from_arrays(
        pa.array(np.arange(len(out) + 1, dtype=np.int32), pa.int32()),
        grounding_struct,
    )
    did = doc_ids.to_numpy(dtype=object)[op]
    chunk_ids = pd.Series(did).str.cat(
        [pages32.astype(str), src_off.astype(str)], sep=":"
    )
    chunk_type = np.where(kind == "media", "figure", kind)
    chunk_struct = pa.StructArray.from_arrays(
        [
            pa.array(rendered.to_numpy(dtype=object), pa.string()),
            ground_list,
            pa.array(chunk_type, pa.string()),
            pa.array(chunk_ids.to_numpy(dtype=object), pa.string()),
        ],
        names=["text", "grounding", "chunk_type", "chunk_id"],
    )
    chunks_out = pa.ListArray.from_arrays(
        pa.array(list_offsets(op), pa.int32()), chunk_struct
    )

    err_struct = pa.StructArray.from_arrays(
        [
            pa.array(err_page.astype(np.int32), pa.int32()),
            pa.array(["part unparseable"] * len(err_page), pa.string()),
            pa.array(np.full(len(err_page), -1, dtype=np.int32), pa.int32()),
        ],
        names=["page_num", "error", "error_code"],
    )
    errors_out = pa.ListArray.from_arrays(
        pa.array(list_offsets(err_parent), pa.int32()), err_struct
    )

    return pa.RecordBatch.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(markdown.to_numpy(dtype=object), pa.string()),
            chunks_out,
            spans_out,
            pa.array(np.zeros(n_docs, dtype=np.int32), pa.int32()),
            pa.array(end_page_idx, pa.int32()),
            pa.array(["pdf"] * n_docs, pa.string()),
            errors_out,
        ],
        schema=_OUT_SCHEMA,
    )


def extract_arrow(df: DataFrame, settings: Settings = DEFAULT_SETTINGS) -> DataFrame:
    """documents_raw → ParsedDocument rows, zero shuffles."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows:
                yield extract_batch(b, settings)

    ddl = (
        "doc_id string, markdown string, "
        "chunks array<struct<text:string,grounding:array<struct<page:int,"
        "box:struct<l:double,t:double,r:double,b:double>,image_path:string>>,"
        "chunk_type:string,chunk_id:string>>, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "start_page_idx int, end_page_idx int, doc_type string, "
        "errors array<struct<page_num:int,error:string,error_code:int>>"
    )
    return df.mapInArrow(run, ddl)
