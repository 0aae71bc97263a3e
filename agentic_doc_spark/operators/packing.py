"""Training-sequence packing + deterministic sampling (LLM-pipeline ops).

``pack_sequences`` assigns documents, in stable id order, to contiguous
fixed-token-budget bins — the standard pre-training step that turns a
document corpus into context-window-sized training sequences. The naive
formulation is a running sum over a GLOBAL ORDER (one window over
``ORDER BY doc_id``), which Spark executes as a single-partition sort —
the classic scale-killer. Here it is the textbook distributed prefix
sum instead:

1. range-partition by the order key (``repartitionByRange`` — a range
   exchange, each partition owns a contiguous id interval);
2. per-partition running sum (window PARTITIONED by the range bucket —
   parallel, no global sort);
3. per-partition totals (numPartitions rows) → driver → cumulative
   offsets joined back as a broadcast literal.

The result is invariant to the (sampled, nondeterministic) range
boundaries: global_running(doc) = sum of tokens over all ids ≤ doc, so
the output is exactly reproducible by a plain windowed SUM in any
engine — the DuckDB oracle twin.

``sample_stratified`` is deterministic hash sampling (md5-derived
uniform in [0,1), portable to any engine) with per-stratum rates — the
data-mixing primitive for corpus re-weighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _is_cheap_plan(df: DataFrame) -> bool:
    """True when the frame is scan + row-local narrow ops only
    (project/filter/repartition/alias) — no Python kernels, joins,
    aggregations or generators — so recomputing it twice is cheaper
    than materializing it. Unknown node types count as expensive.
    Plan traversal shared with similarity._fast_count
    (dedup._plan_node_names)."""
    from agentic_doc_spark.operators.dedup import _plan_node_names

    cheap = {
        "Project",
        "Filter",
        "Repartition",
        "RepartitionByExpression",
        "SubqueryAlias",
        "LogicalRelation",
        "LocalRelation",
    }
    names = _plan_node_names(df)
    return names is not None and all(n in cheap for n in names)


def running_totals(
    df: DataFrame,
    order_col: str = "doc_id",
    value_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``running`` = inclusive prefix sum of ``value_col`` in
    ``order_col`` order, without a global-order window.

    Exchange budget: ONE range exchange + one bounded driver collect
    (numPartitions rows); the per-partition window sorts locally. At
    10^12 rows the range exchange is the same cost as any repartition —
    there is no single-reducer global sort anywhere.

    A NON-TRIVIAL input is lineage-truncated first:
    ``repartitionByRange`` evaluates its child once to SAMPLE the range
    boundaries and again for the exchange itself, so an upstream with
    kernels/joins/aggregations (the packed pipeline's dedup chain, the
    interleaved cost folds) would run twice — materializing it makes
    both passes scan stored rows (values unchanged; measured
    pack_interleaved 3.6 → ~1.4 s at sf1.0 local[32]). A plain
    scan/project/filter upstream skips the cut: recomputing it is
    cheaper than storing it (measured +0.34 s on pack_bins)."""
    from agentic_doc_spark.operators.dedup import _truncate_lineage

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    src = df if _is_cheap_plan(df) else _truncate_lineage(df)
    ranged = src.repartitionByRange(
        n, F.col(order_col)
    ).withColumn("_part", F.spark_partition_id())
    w = Window.partitionBy("_part").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # PIN the partitioning before it is consumed twice: range boundaries
    # come from sampling, so a recomputation between the offsets collect
    # and the final projection could re-bucket rows and misalign offsets.
    # _truncate_lineage materializes one concrete partitioning both share
    # — a RELIABLE checkpoint when the session has a checkpoint dir
    # (localCheckpoint blocks are non-recomputable, so executor loss after
    # this point would otherwise fail a production packing job).
    from agentic_doc_spark.operators.dedup import _truncate_lineage

    local = _truncate_lineage(
        ranged.withColumn("_local_run", F.sum(value_col).over(w))
    )
    # bounded: one row per partition → cumulative offsets on the driver
    totals = (
        local.groupBy("_part").agg(F.sum(value_col).alias("_total")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["_part"]):
        offsets[row["_part"]] = acc
        acc += row["_total"] or 0  # all-NULL partition sums to NULL
    if not offsets:
        return local.withColumn("running", F.col("_local_run")).drop(
            "_part", "_local_run"
        )
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    return (
        local.withColumn(
            "running",
            F.col("_local_run")
            + F.coalesce(off_map[F.col("_part")], F.lit(0)),
        )
        .drop("_part", "_local_run")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document to a training bin: documents are laid out
    contiguously in ``order_col`` order and cut every ``budget`` tokens;
    ``bin_id`` = exclusive-prefix-sum // budget (a document starts in
    the bin where its first token lands). Deterministic, engine-portable
    semantics — the DuckDB twin is a plain windowed SUM."""
    run = running_totals(df, order_col, tokens_col, num_partitions)
    return run.withColumn(
        "bin_id",
        ((F.col("running") - F.col(tokens_col)) / budget).cast("long"),
    )


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    uniform_hash(id) < rate(stratum). The hash is the first 15 hex chars
    of md5(id) scaled to [0, 1) — engine-portable (DuckDB:
    ('0x'||substr(md5(id),1,15))::BIGINT / 2^60), reproducible across
    runs/cluster sizes, and uncorrelated with the id distribution.
    Pure map — no shuffle, no RNG state."""
    from agentic_doc_spark.operators.dedup import md5_uniform

    u = md5_uniform(F.col(id_col))
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(u < rate)


def interleaved_costs(
    raw: DataFrame,
    media_tokens: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token cost + modality signature for an INTERLEAVED
    text+media corpus (documents_raw shape: spans of (kind, text,
    media_ref, offset)).

    A text span costs its whitespace token count; a media span
    (``media_ref IS NOT NULL``) costs the fixed ``media_tokens`` budget —
    the image-placeholder-token convention of multimodal pre-training
    (one patch-token block per image). ``sig`` is the in-order modality
    string ('T'/'M' per span, offset order) — the interleaving layout a
    sequence builder must preserve.

    ZERO exchanges and no span text across the Python boundary (r6
    rework, guide §4.1): the JVM projects each doc's spans to three
    COMPACT primitive arrays — offsets, media flags, and costs (token
    count via space-count length arithmetic: size(split(t, ' ')) ≡
    length(t) − length(replace(t, ' ', '')) + 1 — no per-span array
    allocation) — and only those ~13 bytes/span reach the Arrow kernel,
    not the ~45-byte span texts. The kernel does per-doc segment sums
    over the list buffers (integer addition — order-exact) and builds
    the signature with one lexsort by (doc, offset, k) over single-byte
    modality codes ('M' < 'T', the struct sort's tie order). The
    previous explode → groupBy(doc) shape shuffled one row per SPAN
    (~160× the document count) and spent ~2.6 s at sf1.0 local[32] in
    per-span interpreted expression work; this shape measures ~1.2 s.
    A doc with no spans produces no row (explode equivalence) — the
    empty-doc drop happens INSIDE the kernel: a JVM
    ``filter(size(spans) > 0)`` would be pushed below the projection
    and re-evaluate the whole spans expression in the predicate
    (measured +2.4 s on the synthesized corpus). Span structs are
    assumed non-null with non-null text (the documents_raw contract)."""
    import numpy as np
    import pyarrow as pa

    id_type = raw.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_tokens bigint, n_media bigint, sig string"
    )
    mt = int(media_tokens)
    compact = raw.select(
        F.col(id_col),
        F.transform(F.col("spans"), lambda s: s["offset"]).alias("_so"),
        F.transform(
            F.col("spans"), lambda s: s["media_ref"].isNotNull()
        ).alias("_med"),
        F.transform(
            F.col("spans"),
            lambda s: F.when(
                s["media_ref"].isNotNull(), F.lit(mt).cast("long")
            ).otherwise(
                (
                    F.length(s["text"])
                    - F.length(F.replace(s["text"], F.lit(" "), F.lit("")))
                    + 1
                ).cast("long")
            ),
        ).alias("_cost"),
    )

    def run(batches):
        for b in batches:
            ids = b.column(0)
            n = len(ids)
            if n == 0:
                continue

            def flat(la):
                offs = la.offsets.to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
                return offs - offs[0], la.flatten()

            offs, so_v = flat(b.column(1))
            _, med_v = flat(b.column(2))
            _, cost_v = flat(b.column(3))
            starts, ends = offs[:-1], offs[1:]
            so = so_v.to_numpy(zero_copy_only=False)
            is_media = med_v.to_numpy(zero_copy_only=False).astype(bool)
            cost = cost_v.to_numpy(zero_copy_only=False)
            if len(cost) == 0:
                continue
            # reduceat over the KEPT (non-empty) docs' starts only:
            # empty segments occupy no child elements, so consecutive
            # kept starts still delimit exactly one doc's spans — and
            # no kept start can equal len(cost). (Clipping an empty
            # TRAILING start into range instead would shrink the
            # previous doc's segment and undercount it.)
            keep = np.flatnonzero(ends > starts)  # explode-equivalence
            if len(keep) == 0:
                continue
            ks = starts[keep]
            n_tokens = np.add.reduceat(cost, ks)
            n_media = np.add.reduceat(is_media.astype(np.int64), ks)
            seg = np.repeat(np.arange(n), ends - starts)
            kb = np.where(is_media, b"M", b"T").astype("S1")
            order = np.lexsort((~is_media, so, seg))  # 'M' first on ties
            bb = kb[order].tobytes()
            sigs = [
                bb[starts[i] : ends[i]].decode("ascii") for i in keep
            ]
            take = pa.array(keep, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(take),
                    pa.array(n_tokens, type=pa.int64()),
                    pa.array(n_media, type=pa.int64()),
                    pa.array(sigs, type=pa.string()),
                ],
                [id_col, "n_tokens", "n_media", "sig"],
            )

    return compact.mapInArrow(run, out_schema)


def pack_interleaved(
    raw: DataFrame,
    budget: int = 512,
    media_tokens: int = 64,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Pack an interleaved text+media corpus into fixed-token-budget
    training sequences: per-doc cost = text tokens + ``media_tokens``
    per image (``interleaved_costs``), whole-doc greedy layout in
    ``id_col`` order via the distributed prefix sum
    (``pack_sequences``), then one row per bin carrying the
    concatenated modality signature — the interleaved analog of
    ``materialize_bins``.

    Output: (bin_id, n_docs, n_tokens, n_media, sig) where ``sig``
    joins the per-doc 'T'/'M' layouts with '|' in id order.

    Exchange budget: 1 groupBy(doc) + 1 range exchange (prefix sum) +
    1 groupBy(bin) — no global-order window, no skew beyond the
    bounded bin size (≈ budget tokens)."""
    costs = interleaved_costs(raw, media_tokens, id_col)
    packed = pack_sequences(
        costs, budget, order_col=id_col, tokens_col="n_tokens",
        num_partitions=num_partitions,
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(id_col), F.col("sig")))
    )
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_media").alias("n_media"),
        F.array_join(
            F.transform(ordered, lambda s: s["sig"]), "|"
        ).alias("sig"),
    )


def materialize_bins(
    packed: DataFrame,
    order_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(…, bin_id) from ``pack_sequences`` → one row per training bin:
    (bin_id, n_docs, n_tokens, text) with documents concatenated in
    ``order_col`` order — the final materialization step that turns bin
    assignments into actual training sequences. Documents are never
    split: a doc lives wholly in the bin where its first token lands
    (greedy whole-doc packing), so a bin's n_tokens may exceed the
    budget by less than one document.

    One exchange (groupBy bin_id, bounded groups ≈ budget tokens);
    ordering is in-row (array_sort over collected structs), no window."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(order_col), F.col(text_col)))
    )
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(tokens_col).alias(tokens_col),
        F.array_join(
            F.transform(ordered, lambda s: s[text_col]), " "
        ).alias(text_col),
    )
