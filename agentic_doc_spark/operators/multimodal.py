"""Multimodal column plumbing (training-data-pipeline requirement).

Images/audio/video ride as opaque BINARY columns with typed metadata
(schema.MEDIA_REFS). The Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested; the actual codec work
is STUBBED behind ``_decode_image``: the container ships no image/audio
libraries, so decode falls back to a deterministic fake derived from the
bytes (same contract the reference's rasterize/crop kernels would fill,
agentic_doc/utils.py:110-211, K1/K2).

All operators are mapInPandas — one Arrow batch in/out, no per-row Python
at the Spark level; the pandas frame is processed with vectorized ops plus
a tight loop over binary payloads (unavoidable for codecs; each payload is
itself bulk work).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # real decoder if ever available — not in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _decode_image(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode → (width, height, tiny feature vector).

    STUB: with no imaging library present, emits a deterministic fake —
    dims from the byte length, features from a seeded hash — keeping
    every downstream shape contract real."""
    if _HAS_PIL:
        raise NotImplementedError(
            "real decode path intentionally not implemented in this sandbox"
        )
    h = hashlib.sha256(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    rng = np.random.default_rng(int.from_bytes(h[2:10], "big"))
    feat = rng.standard_normal(8).astype(np.float32)
    return width, height, feat


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_media_features(media: DataFrame) -> DataFrame:
    """media(media_ref, content BINARY) → per-media features.

    Arrow-batched; scale path: media bytes stay columnar in parquet, the
    decode cost dominates so partitioning by file size (maxPartitionBytes)
    load-balances executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["content"]):
                w, h, feat = _decode_image(bytes(data) if data is not None else b"")
                rows.append((ref, w, h, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_ref", "width", "height", "features"]
            )

    return media.mapInPandas(run, _FEATURES_SCHEMA)


def grounding_crop_specs(
    parsed: DataFrame, page_width: int = 816, page_height: int = 1056
) -> DataFrame:
    """S9: the grounding-image sink, minus the raster bytes.

    Reproduces the reference's crop pipeline exactly up to the decode
    boundary (save_groundings_as_images, agentic_doc/utils.py:63-169):
    chunks explode to one row per grounding, boxes clamp and convert to
    pixel rects (F3, utils.py:193-208), and the output path follows the
    reference naming ``page_{p}/{chunk_type}_{chunk_id}_{i}.png``
    (utils.py:150-156). Rows come back sorted by (doc, page) — the
    render-each-page-once iteration order (A3, utils.py:94-104). Feeding
    these specs plus page rasters to a crop UDF is the stubbed step.

    Default page dims = US-letter at the reference's 96 dpi
    (agentic_doc/config.py:118-122)."""
    from pyspark.sql import functions as F

    from agentic_doc_spark.functions.geometry import box_is_valid, box_to_pixels

    g = parsed.select(
        "doc_id", F.explode("chunks").alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_type").alias("chunk_type"),
        F.posexplode("c.grounding").alias("grounding_idx", "g"),
    )
    px = box_to_pixels(
        F.col("g.box"), F.lit(page_width), F.lit(page_height)
    )
    return (
        g.filter(box_is_valid(F.col("g.box")))
        .select(
            "doc_id",
            F.col("g.page").alias("page"),
            "chunk_id",
            "chunk_type",
            px.alias("px"),
            F.concat(
                F.lit("page_"),
                F.col("g.page"),
                F.lit("/"),
                F.col("chunk_type"),
                F.lit("_"),
                F.col("chunk_id"),
                F.lit("_"),
                F.col("grounding_idx"),
                F.lit(".png"),
            ).alias("rel_path"),
        )
        .orderBy("doc_id", "page")
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """video(media_ref, content) → sampled frame rows (K1-analog plumbing).

    STUB decode: frames are deterministic byte slices; real codecs slot in
    behind the same mapInPandas signature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(data) if data is not None else b""
                n_frames = max(1, len(b) // 256)
                for i in range(0, n_frames, every_n):
                    chunk = b[i * 256 : (i + 1) * 256]
                    rows.append(
                        (ref, i, hashlib.sha256(chunk).hexdigest()[:16])
                    )
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "frame_sha"]
            )

    return media.mapInPandas(run, _FRAME_SCHEMA)
