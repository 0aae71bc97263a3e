"""Multimodal column plumbing (training-data-pipeline requirement).

Images/audio/video ride as opaque BINARY columns with typed metadata
(schema.MEDIA_REFS). Image decode is REAL for PNG and for baseline AND
progressive JPEG, GIF (incl. animation), and BMP via the pure-stdlib
codecs in functions/{png,jpeg,gif,bmp,tiff,jpx}.py (PIL slots in ahead of them
when installed) — see ``_decode_array``'s decode ladder. Payloads
outside that ladder (arithmetic/12-bit JPEG, other formats)
fall back to a deterministic fake derived from the bytes,
and every row SURFACES which path it took via the ``decoded`` flag.
Audio features are REAL for WAV/PCM payloads (functions/riff.py
parse_wav → extract_audio_features); video frame sampling is REAL for
MJPEG and raw-DIB AVIs plus animated GIFs; the
reference fills the same contract with cv2/pymupdf
(agentic_doc/utils.py:110-211, K1/K2).

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


def _decode_array(data: bytes) -> np.ndarray | None:
    """bytes → uint8 (h, w, ch) array, or None when undecodable.

    Decode ladder: PIL (any format, when installed) → the pure-stdlib
    codecs: PNG (functions/png.py), baseline+progressive JPEG
    (functions/jpeg.py), GIF (functions/gif.py), BMP
    (functions/bmp.py) — all REAL even in this container → None."""
    if not data:
        return None
    if _HAS_PIL:
        import io

        try:
            img = Image.open(io.BytesIO(data)).convert("RGB")
            return np.asarray(img, dtype=np.uint8)
        except Exception:
            pass
    from agentic_doc_spark.functions import jpeg, png

    if png.is_png(data):
        try:
            return png.decode_png(data)
        except Exception:
            return None
    if jpeg.is_jpeg(data):
        try:
            arr = jpeg.decode_jpeg(data)
            return arr[:, :, None] if arr.ndim == 2 else arr
        except Exception:
            return None
    from agentic_doc_spark.functions import bmp, gif, tiff

    if gif.is_gif(data):
        try:
            return gif.decode_gif(data)
        except Exception:
            return None
    if bmp.is_bmp(data):
        try:
            return bmp.decode_bmp(data)
        except Exception:
            return None
    if tiff.is_tiff(data):
        try:
            return tiff.decode_tiff(data)
        except Exception:
            return None
    from agentic_doc_spark.functions import jpx

    if jpx.is_jpx(data):
        try:
            arr = jpx.decode_jpx(data)
            return arr[:, :, None] if arr.ndim == 2 else arr
        except Exception:
            return None
    return None


def _decode_image(data: bytes) -> tuple[int, int, np.ndarray, bool]:
    """Decode → (width, height, 8-dim feature vector, decoded flag).

    Real path: decode (PIL or pure-PNG) → 4×2 nearest downsample →
    per-cell channel means /255 (reference page_to_image,
    agentic_doc/utils.py:110-124). Fallback for undecodable payloads: a
    deterministic fake — dims from the byte hash, features from a seeded
    generator — keeping every downstream shape contract real."""
    arr = _decode_array(data)
    if arr is not None:
        height, width = arr.shape[:2]
        if arr.ndim == 2:
            arr = arr[:, :, None]
        # TRUE per-cell means over a 4×2 grid (every pixel contributes —
        # nearest-neighbor point samples would all land on background for
        # sparse-ink document pages, collapsing every page to the same
        # feature vector)
        ys = np.linspace(0, height, 3, dtype=np.int64)
        xs = np.linspace(0, width, 5, dtype=np.int64)
        cells = [
            arr[ys[r] : max(ys[r + 1], ys[r] + 1),
                xs[c] : max(xs[c + 1], xs[c] + 1)].mean() / 255.0
            for r in range(2)
            for c in range(4)
        ]
        feat = np.asarray(cells, dtype=np.float32)
        return width, height, feat, True
    h = hashlib.sha256(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    rng = np.random.default_rng(int.from_bytes(h[2:10], "big"))
    feat = rng.standard_normal(8).astype(np.float32)
    return width, height, feat, False


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def extract_media_features(media: DataFrame) -> DataFrame:
    """media(media_ref, content BINARY) → per-media features.

    ``decoded`` SURFACES the codec boundary per row: True = features came
    from real pixel data (PIL or the pure PNG codec), False = the payload
    was undecodable and the features are the deterministic hash fake —
    downstream consumers (ANN, dedup) filter on it instead of silently
    training on fakes.

    Arrow-batched; scale path: media bytes stay columnar in parquet, the
    decode cost dominates so partitioning by file size (maxPartitionBytes)
    load-balances executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(data) if data is not None else b""
                w, h, feat, ok = _decode_image(b)
                rows.append((ref, w, h, feat.tolist(), ok))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "width", "height", "features", "decoded"],
            )

    return media.mapInPandas(run, _FEATURES_SCHEMA)


def _safe_path_part(col) -> "F.Column":
    """Sanitize a path component derived from untrusted data (doc_id is
    an arbitrary string for parquet corpora and a filesystem path for dir
    corpora): every character outside [A-Za-z0-9._-] becomes '_', so a
    component can never introduce a path separator — '../' in a doc_id
    cannot escape the save dir, and path-shaped ids cannot fan out into
    unintended directory trees. Applied identically by the spec builder
    and the image_path attacher so the two stay equal; the reference
    avoids the issue with opaque chunk ids (utils.py:150-156)."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col.cast("string"), "[^A-Za-z0-9._-]", "_")


def grounding_crop_specs(
    parsed: DataFrame,
    page_width: int = 816,
    page_height: int = 1056,
    include_text: bool = False,
) -> DataFrame:
    """S9: the grounding-image sink, minus the raster bytes.

    Reproduces the reference's crop pipeline exactly up to the decode
    boundary (save_groundings_as_images, agentic_doc/utils.py:63-169):
    chunks explode to one row per grounding, boxes clamp and convert to
    pixel rects (F3, utils.py:193-208), and the output path follows the
    reference naming ``page_{p}/{chunk_type}_{chunk_id}_{i}.png``
    (utils.py:150-156). Rows come back sorted by (doc, page) WITHIN each
    partition — per-page locality is all the render-each-page-once
    iteration needs (A3, utils.py:94-104); the chunk explode is narrow,
    so a doc's rows are already co-located and a global range shuffle
    would buy nothing at any scale. Feeding these specs plus page
    rasters to a crop UDF is the stubbed step.

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
        *([F.col("c.text").alias("text")] if include_text else []),
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
            *(["text"] if include_text else []),
            px.alias("px"),
            F.concat(
                F.lit("page_"),
                F.col("g.page"),
                F.lit("/"),
                _safe_path_part(F.col("chunk_type")),
                F.lit("_"),
                _safe_path_part(F.col("chunk_id")),
                F.lit("_"),
                F.col("grounding_idx"),
                F.lit(".png"),
            ).alias("rel_path"),
        )
        .sortWithinPartitions("doc_id", "page")
    )


def attach_grounding_image_paths(parsed: DataFrame, save_dir: str) -> DataFrame:
    """Populate ``grounding.image_path`` with the exact path the crop
    renderer writes (``{save_dir}/page_{p}/{type}_{chunk_id}_{i}.png`` —
    reference save_groundings_as_images naming, agentic_doc/utils.py:
    150-156; the reference sets image_path only when a grounding save
    dir is given, parse.py:441-448). Pure in-row transform — the path is
    deterministic, so no join with the rendered crops is needed.

    image_path stays NULL for groundings the renderer would SKIP
    (invalid/degenerate boxes — the same box_is_valid predicate
    grounding_crop_specs filters on), so no path ever points at a file
    that cannot exist. A page that later fails to decode is the one case
    this in-row transform cannot see; the renderer logs those by absence.
    NULL chunk / grounding elements pass through as NULL."""
    from pyspark.sql import functions as F

    from agentic_doc_spark.functions.geometry import box_is_valid

    base = save_dir.rstrip("/")

    def grounding_out(c, g, i):
        path = F.concat(
            F.lit(f"{base}/page_"),
            g["page"],
            F.lit("/"),
            _safe_path_part(c["chunk_type"]),
            F.lit("_"),
            _safe_path_part(c["chunk_id"]),
            F.lit("_"),
            i,
            F.lit(".png"),
        )
        new = F.struct(
            g["page"].alias("page"),
            g["box"].alias("box"),
            F.when(box_is_valid(g["box"]), path).alias("image_path"),
        )
        return F.when(g.isNotNull(), new)  # NULL element stays NULL

    chunks = F.transform(
        F.col("chunks"),
        lambda c: F.when(
            c.isNotNull(),
            F.struct(
                c["text"].alias("text"),
                F.transform(
                    c["grounding"], lambda g, i: grounding_out(c, g, i)
                ).alias("grounding"),
                c["chunk_type"].alias("chunk_type"),
                c["chunk_id"].alias("chunk_id"),
            ),
        ),
    )
    return parsed.withColumn("chunks", chunks)


def viz_crop_specs(
    specs: DataFrame, page_width: int = 816, page_height: int = 1056
) -> DataFrame:
    """K3: textual visualization — one SVG overlay per (doc, page).

    The reference draws chunk boxes onto page rasters (viz_parsed_document,
    agentic_doc/utils.py:294-414); without an imaging library the same
    information renders as an inline-SVG string: one ``<rect>`` +
    ``<text>`` label per chunk, page-sized canvas. Pure Catalyst
    (sort_array + transform + concat) over the crop specs — one narrow
    aggregation keyed by (doc_id, page), no Python."""
    from pyspark.sql import functions as F

    rect = lambda c: F.concat(  # noqa: E731
        F.lit('<rect x="'),
        c["px"]["x0"],
        F.lit('" y="'),
        c["px"]["y0"],
        F.lit('" width="'),
        c["px"]["x1"] - c["px"]["x0"],
        F.lit('" height="'),
        c["px"]["y1"] - c["px"]["y0"],
        F.lit('" class="'),
        c["chunk_type"],
        F.lit('"/><text x="'),
        c["px"]["x0"],
        F.lit('" y="'),
        c["px"]["y0"],
        F.lit('">'),
        c["chunk_id"],
        F.lit("</text>"),
    )
    per_page = specs.groupBy("doc_id", "page").agg(
        F.sort_array(
            F.collect_list(F.struct("chunk_id", "chunk_type", "px"))
        ).alias("cs")
    )
    svg = F.concat(
        F.lit(f'<svg width="{page_width}" height="{page_height}">'),
        F.array_join(F.transform(F.col("cs"), rect), ""),
        F.lit("</svg>"),
    )
    return per_page.select("doc_id", "page", svg.alias("svg"))


_CROPS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("rel_path", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def render_grounding_crops(
    parsed: DataFrame,
    pages: DataFrame,
    page_width: int = 816,
    page_height: int = 1056,
    count_decodes: bool = False,
) -> DataFrame:
    """S9/K2 for REAL: crop PNG bytes per grounding, named exactly as the
    reference writes them (save_groundings_as_images,
    agentic_doc/utils.py:63-169: ``page_{p}/{type}_{chunk_id}_{i}.png``).

    ``pages`` is (doc_id, page, content BINARY) — rasterized page images
    (PNG; any PIL-readable format when PIL is present; rasterize_pages
    synthesizes them when no renderer output is available). The crop
    specs (geometry, clamping, naming) come from grounding_crop_specs;
    this join + mapInPandas kernel decodes each page ONCE per
    partition-local group and emits one PNG per grounding. Undecodable
    pages are skipped (R6). The join is an equi-join on (doc_id, page) —
    at 10^12 docs both sides partition on the same key, no broadcast
    assumption. The (doc_id, page) sort runs AFTER the join so the
    decode-once LRU holds under EVERY join strategy — a shuffled hash
    join interleaves keys arbitrarily, and pre-join order does not
    survive its exchange.

    ``count_decodes=True`` appends a ``cache_miss`` column (True on the
    row that triggered the page decode) — the instrumentation the
    decode-locality test pins the once-per-page property with."""
    from agentic_doc_spark.functions.png import crop, encode_png

    specs = grounding_crop_specs(parsed, page_width, page_height)
    joined = (
        specs.join(pages, ["doc_id", "page"])
        .select("doc_id", "page", "rel_path", "px", "content")
        .sortWithinPartitions("doc_id", "page")
    )
    schema = _CROPS_SCHEMA
    if count_decodes:
        schema = T.StructType(
            _CROPS_SCHEMA.fields + [T.StructField("cache_miss", T.BooleanType())]
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import OrderedDict

        cols = [f.name for f in schema.fields]
        # decode each page once per key GROUP: rows arrive key-sorted
        # (sortWithinPartitions AFTER the join) so a small LRU suffices —
        # an unbounded cache of decoded pages (~2.6 MB each) would grow
        # without limit on page-diverse partitions. Scoped to the
        # PARTITION (outside the batch loop) so a group that straddles an
        # Arrow batch boundary still decodes once.
        cache: OrderedDict[tuple, np.ndarray | None] = OrderedDict()
        for pdf in batches:
            rows = []
            for doc_id, page, rel, px, data in zip(
                pdf["doc_id"], pdf["page"], pdf["rel_path"], pdf["px"], pdf["content"]
            ):
                key = (doc_id, page)
                miss = key not in cache
                if miss:
                    arr = _decode_array(bytes(data) if data is not None else b"")
                    cache[key] = arr
                    while len(cache) > 8:
                        cache.popitem(last=False)
                arr = cache[key]
                if arr is None:  # R6: undecodable page → skip its crops
                    continue
                # spec px live in the reference page space
                # (page_width × page_height); the REAL page image may
                # have any dimensions (scanned rasters, caller DPI) —
                # scale the rect to the decoded page, keeping ≥1 px.
                ah, aw = arr.shape[:2]
                sx, sy = aw / page_width, ah / page_height
                x0 = int(px["x0"] * sx)
                y0 = int(px["y0"] * sy)
                x1 = max(int(px["x1"] * sx), x0 + 1)
                y1 = max(int(px["y1"] * sy), y0 + 1)
                piece = crop(arr, x0, y0, min(x1, aw), min(y1, ah))
                if piece.size == 0:
                    continue
                out = (doc_id, rel, bytearray(encode_png(piece)))
                rows.append(out + (miss,) if count_decodes else out)
            yield pd.DataFrame(rows, columns=cols)

    return joined.mapInPandas(run, schema)


_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def rasterize_pages(
    parsed: DataFrame, page_width: int = 816, page_height: int = 1056
) -> DataFrame:
    """K1's raster half: (doc_id, page, content PNG) page images rendered
    from the parsed layout itself — the in-engine stand-in for a PDF
    renderer (reference page_to_image, agentic_doc/utils.py:110-124,
    rasterizes with pypdfium2; this container has no PDF renderer, so the
    page is SYNTHESIZED deterministically from the chunk geometry: each
    grounding box draws a tinted bordered block and the chunk's ACTUAL
    TEXT renders inside it through the embedded 5×7 bitmap font
    (functions/bitmapfont.py) — grounding crops of born-digital
    documents therefore contain legible glyph pixels, the closest this
    sandbox gets to the reference's pymupdf page render. Text-less
    chunks (media/figure placeholders) keep the ragged
    sha256(chunk_id)-seeded ink runs). Feeding these to
    render_grounding_crops closes the parse → crop-files loop with zero
    caller-supplied rasters; swap in real renderer output (same schema)
    when one is available.

    Plan shape: one groupBy (doc_id, page) over the exploded crop specs
    (map-side combinable collect_list, groups are page-sized), then a
    pure mapInPandas render — canvas memory is one page (~2.6 MB) at a
    time per worker."""
    from pyspark.sql import functions as F

    from agentic_doc_spark.functions.bitmapfont import render_wrapped
    from agentic_doc_spark.functions.png import encode_png

    specs = grounding_crop_specs(
        parsed, page_width, page_height, include_text=True
    )
    per_page = specs.groupBy("doc_id", "page").agg(
        F.sort_array(
            # chunk_id leads the struct, so sort order (and thus z-order
            # of overlapping blocks) is unchanged by the text field
            F.collect_list(F.struct("chunk_id", "chunk_type", "px", "text"))
        ).alias("cs")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, page, cs in zip(pdf["doc_id"], pdf["page"], pdf["cs"]):
                canvas = np.full((page_height, page_width, 3), 255, np.uint8)
                for c in cs:
                    px = c["px"]
                    x0, y0 = int(px["x0"]), int(px["y0"])
                    x1, y1 = int(px["x1"]), int(px["y1"])
                    if x1 <= x0 or y1 <= y0:
                        continue
                    seed = hashlib.sha256(
                        str(c["chunk_id"]).encode()
                    ).digest()
                    # block background tint + 2px border
                    canvas[y0:y1, x0:x1] = (
                        205 + seed[0] % 50,
                        215 + seed[1] % 40,
                        225 + seed[2] % 30,
                    )
                    canvas[y0 : min(y0 + 2, y1), x0:x1] = 60
                    canvas[max(y1 - 2, y0) : y1, x0:x1] = 60
                    canvas[y0:y1, x0 : min(x0 + 2, x1)] = 60
                    canvas[y0:y1, max(x1 - 2, x0) : x1] = 60
                    text = (c["text"] or "").strip()
                    if text:
                        # the chunk's real text in 5×7 glyphs, wrapped
                        render_wrapped(
                            canvas, x0 + 4, y0 + 4, x1 - 3, y1 - 2, text
                        )
                        continue
                    # ragged text runs: 2px dark lines, widths from the seed
                    for li, y in enumerate(range(y0 + 5, y1 - 4, 7)):
                        frac = 0.5 + (seed[(3 + li) % 32] % 115) / 256.0
                        xe = x0 + 3 + int((x1 - x0 - 6) * min(frac, 1.0))
                        canvas[y : y + 2, x0 + 3 : max(xe, x0 + 4)] = 30
                rows.append((doc_id, int(page), bytearray(encode_png(canvas))))
            yield pd.DataFrame(rows, columns=["doc_id", "page", "content"])

    return per_page.mapInPandas(run, _PAGES_SCHEMA)


def write_grounding_images(crops: DataFrame, save_dir: str) -> None:
    """Materialize rendered crops as files: ``{save_dir}/{rel_path}`` —
    the exact paths attach_grounding_image_paths put in
    ``grounding.image_path``. Executor-side foreachPartition (no
    driver collect); ``save_dir`` must be storage every executor can
    reach (local fs in local mode, NFS/object-store mount on a
    cluster)."""
    base = save_dir.rstrip("/")

    def write_part(rows) -> None:
        import os

        root = os.path.realpath(base)
        for row in rows:
            out = f"{base}/{row['rel_path']}"
            # grounding_crop_specs sanitizes every untrusted component,
            # so this guard only fires on a hand-built crops frame — but
            # escaping save_dir must be impossible, not merely unlikely
            real = os.path.realpath(out)
            if real != root and not real.startswith(root + os.sep):
                raise ValueError(
                    f"grounding rel_path escapes save_dir: {row['rel_path']!r}"
                )
            os.makedirs(os.path.dirname(out), exist_ok=True)
            tmp = f"{out}.part"
            with open(tmp, "wb") as f:
                f.write(bytes(row["content"]))
            os.replace(tmp, out)  # publish whole files only

    crops.foreachPartition(write_part)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize images to a fixed training shape (media_ref, width, height,
    content). REAL path: decode (PIL or the pure-stdlib PNG codec) →
    nearest-neighbor resize → PNG re-encode; fallback for undecodable
    payloads: a deterministic sha-derived payload of the target shape so
    batching/schema stay production-shaped.

    Scale: pure mapInPandas over binary parquet — decode dominates, so
    partitioning by file size (maxPartitionBytes) load-balances; output
    bytes are bounded by the target shape, not the input."""
    from agentic_doc_spark.functions.png import encode_png, resize_nearest

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(data) if data is not None else b""
                arr = _decode_array(b)
                if arr is not None:
                    out = encode_png(resize_nearest(arr, width, height))
                else:  # deterministic fake, bounded size
                    seed = hashlib.sha256(b).digest()
                    reps = (width * height * 3) // len(seed) + 1
                    out = (seed * reps)[: width * height * 3]
                rows.append((ref, width, height, bytearray(out)))
            yield pd.DataFrame(
                rows, columns=["media_ref", "width", "height", "content"]
            )

    return media.mapInPandas(run, _RESIZED_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """video(media_ref, content) → every Nth frame's row.

    REAL path for MJPEG AVIs (the classic zero-dependency layout):
    functions/riff.py demuxes the ``movi`` chunks, every_n-th frame's
    JPEG payload decodes through functions/jpeg.py for true dims, and
    frame_sha fingerprints the raw frame bytes. Payloads that are not a
    demuxable AVI keep the previous deterministic byte-slice contract
    with ``decoded=False`` — the same surfaced boundary as
    extract_media_features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from agentic_doc_spark.functions.riff import extract_avi_frames

        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(data) if data is not None else b""
                frames = extract_avi_frames(b)
                if frames:
                    for i in range(0, len(frames), every_n):
                        arr = _decode_array(frames[i])
                        h, w = arr.shape[:2] if arr is not None else (0, 0)
                        rows.append(
                            (
                                ref,
                                i,
                                int(w),
                                int(h),
                                hashlib.sha256(frames[i]).hexdigest()[:16],
                                arr is not None,
                            )
                        )
                    continue
                from agentic_doc_spark.functions.gif import (
                    gif_frames,
                    is_gif,
                )

                if is_gif(b):
                    try:
                        # stride retains only the sampled frames: every
                        # frame is still COMPOSED (disposal semantics),
                        # but memory holds n/every_n canvases, not n
                        composed = gif_frames(b, stride=every_n)
                    except Exception:
                        composed = []
                    if composed:
                        for i, arr in enumerate(composed):
                            rows.append(
                                (
                                    ref,
                                    i * every_n,
                                    int(arr.shape[1]),
                                    int(arr.shape[0]),
                                    hashlib.sha256(
                                        arr.tobytes()
                                    ).hexdigest()[:16],
                                    True,
                                )
                            )
                        continue
                # non-AVI/GIF payload: deterministic fake slices, surfaced
                n_frames = max(1, len(b) // 256)
                for i in range(0, n_frames, every_n):
                    chunk = b[i * 256 : (i + 1) * 256]
                    rows.append(
                        (
                            ref,
                            i,
                            0,
                            0,
                            hashlib.sha256(chunk).hexdigest()[:16],
                            False,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "frame_idx", "width", "height",
                    "frame_sha", "decoded",
                ],
            )

    return media.mapInPandas(run, _FRAME_SCHEMA)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """audio(media_ref, content BINARY) → per-clip features: sample rate,
    channels, duration, RMS energy, zero-crossing rate, peak amplitude.

    REAL path for WAV/PCM payloads (functions/riff.py::parse_wav — pure
    stdlib, 8/16-bit integer and float32, multi-channel downmixed);
    other codecs (mp3/ogg/flac need decoders this container lacks) take
    the deterministic hash fake with ``decoded=False`` — the same
    surfaced boundary as the image/video operators. mapInPandas over
    binary parquet; decode dominates, so size-based partitioning
    (maxPartitionBytes) load-balances."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from agentic_doc_spark.functions.riff import parse_wav

        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(data) if data is not None else b""
                w = parse_wav(b)
                if w is not None and len(w["samples"]):
                    x = w["samples"]
                    sr = w["sample_rate"]
                    zc = (
                        float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                        if len(x) > 1
                        else 0.0  # a 1-sample clip has no crossings
                    )
                    rows.append(
                        (
                            ref,
                            sr,
                            w["channels"],
                            len(x) / sr,
                            float(np.sqrt(np.mean(x * x))),
                            zc,
                            float(np.max(np.abs(x))),
                            True,
                        )
                    )
                else:  # deterministic fake, surfaced
                    seed = hashlib.sha256(b).digest()
                    rows.append(
                        (
                            ref,
                            16000,
                            1,
                            (seed[0] % 60) + 1.0,
                            seed[1] / 512.0,
                            seed[2] / 512.0,
                            seed[3] / 256.0,
                            False,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "sample_rate", "channels", "duration_sec",
                    "rms", "zero_cross_rate", "peak", "decoded",
                ],
            )

    return media.mapInPandas(run, _AUDIO_SCHEMA)


def strip_media_boilerplate(
    docs: DataFrame,
    max_doc_freq: int,
    key=None,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    max_hot_keys: int = 100_000,
) -> DataFrame:
    """Image-boilerplate removal for INTERLEAVED text+media corpora:
    drop media spans whose content key appears in MORE than
    ``max_doc_freq`` distinct documents — the multimodal analog of text
    boilerplate stripping (logos, nav icons, tracking pixels repeated
    across a crawl; the cleanup step interleaved-pretraining corpora
    like OBELICS apply, public method). Text spans are untouched;
    surviving spans keep their original array order and offsets, so the
    interleaved T/M layout every downstream consumer orders by is
    preserved.

    ``key`` maps a span struct Column to its content key (default: the
    ``media_ref`` itself; a production pipeline passes a bytes-hash —
    e.g. ``lambda s: F.xxhash64(s["content"])`` after joining the media
    table, or a perceptual hash column).

    Plan shape: ONE map-side-combinable count-distinct aggregation over
    media spans (keys × docs), then the hot set — bounded above by
    total_media_spans / max_doc_freq keys, i.e. small for any sane
    threshold — collects to an array LITERAL and the span rewrite is a
    pure in-row ``filter``: zero exchanges over the corpus at rewrite
    time, no join, no re-collect of span arrays. ``max_hot_keys`` guards
    a misconfigured threshold (hot set no longer "boilerplate-sized")
    with a clear error instead of a silent giant literal."""
    from pyspark.sql import functions as F

    def is_media(s):
        return s["media_ref"].isNotNull() & (s["media_ref"] != "")

    if key is None:
        key = lambda s: s["media_ref"]  # noqa: E731

    ex = docs.select(F.col(id_col), F.explode(spans_col).alias("s"))
    freq = (
        ex.filter(is_media(F.col("s")))
        .groupBy(key(F.col("s")).alias("k"))
        .agg(F.countDistinct(id_col).alias("df"))
    )
    hot_rows = freq.filter(F.col("df") > int(max_doc_freq)).collect()
    if len(hot_rows) > max_hot_keys:
        raise ValueError(
            f"strip_media_boilerplate: {len(hot_rows)} keys exceed "
            f"doc-frequency {max_doc_freq} (cap {max_hot_keys}) — the "
            "threshold matches far more than boilerplate; raise "
            "max_doc_freq or pre-bucket the keys"
        )
    hot = sorted(str(r["k"]) for r in hot_rows if r["k"] is not None)
    if not hot:
        return docs
    # NULL keys (e.g. an undecodable image's hash) must KEEP the span:
    # array_contains(..., NULL) is NULL and a bare ~NULL predicate would
    # silently drop exactly the spans that are NOT boilerplate
    keep = lambda s: ~F.coalesce(  # noqa: E731
        is_media(s) & F.array_contains(F.lit(hot), key(s).cast("string")),
        F.lit(False),
    )
    return docs.withColumn(spans_col, F.filter(F.col(spans_col), keep))
