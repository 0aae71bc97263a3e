"""Per-partition lineage + exact resume (north rule R7/J2; FIXTURES.md §5).

The reference re-runs idempotently by writing timestamped JSON
(agentic_doc/parse.py:453-467); at 10^12-document scale that is replaced by
an append-only ``extraction_metrics`` table and an anti-join restart:

    restart input = documents_raw LEFT ANTI JOIN completed doc_ids

Checksums are hierarchical so no unbounded string ever materializes:
per-doc checksum = sha256 over that doc's ordered span tuples (computed
inside the row, bounded by doc size), partition checksum = sha256 of the
sorted per-doc checksums. The metrics table is parquet here (Iceberg's
snapshot id degrades to a caller-supplied string — SURVEY.md §7.3 sandbox
note); on a real cluster the writer is `format("iceberg")` with the same
schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def doc_checksum_col() -> F.Column:
    """Deterministic per-document checksum over the ordered output spans."""
    parts = F.transform(
        F.col("spans"),
        lambda s: F.concat_ws(
            "\x1f",
            F.col("doc_id"),
            s["offset"],
            s["kind"],
            F.coalesce(s["text"], F.lit("")),
            F.coalesce(s["media_ref"], F.lit("")),
        ),
    )
    return F.sha2(F.array_join(parts, "\x1e"), 256)


def lineage_rows(
    parsed: DataFrame, run_id: str, input_snapshot_id: str
) -> DataFrame:
    """One lineage row per Spark partition of the parsed output
    (EXTRACTION_METRICS schema). All-JVM: partition id via
    spark_partition_id, one narrow groupBy."""
    per_doc = parsed.select(
        F.spark_partition_id().alias("partition_id"),
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        doc_checksum_col().alias("doc_checksum"),
    )
    return per_doc.groupBy("partition_id").agg(
        F.lit(run_id).alias("run_id"),
        F.lit(input_snapshot_id).alias("input_snapshot_id"),
        F.sort_array(F.collect_list("doc_id")).alias("doc_ids_completed"),
        F.sum("n_spans").alias("span_count"),
        F.sha2(
            F.array_join(F.sort_array(F.collect_list("doc_checksum")), ""), 256
        ).alias("checksum"),
    ).select(
        "run_id",
        "partition_id",
        "input_snapshot_id",
        "doc_ids_completed",
        "span_count",
        "checksum",
    )


def write_lineage(
    parsed: DataFrame, metrics_path: str, run_id: str, input_snapshot_id: str
) -> None:
    """Append lineage rows for a completed batch (S8-style append sink)."""
    lineage_rows(parsed, run_id, input_snapshot_id).write.mode("append").parquet(
        metrics_path
    )


def completed_doc_ids(spark: SparkSession, metrics_path: str) -> DataFrame:
    """Distinct completed doc_ids from all prior runs."""
    return (
        spark.read.parquet(metrics_path)
        .select(F.explode("doc_ids_completed").alias("doc_id"))
        .distinct()
    )


def resume_filter(raw: DataFrame, completed: DataFrame) -> DataFrame:
    """J2: the resume anti-join — drop already-completed documents.

    At scale the completed side is doc_ids only (narrow); AQE converts
    this to a broadcast anti-join whenever it fits, otherwise a shuffled
    anti-join on the same doc_id key the corpus is bucketed by."""
    return raw.join(completed, "doc_id", "left_anti")


def run_with_resume(
    spark: SparkSession,
    raw: DataFrame,
    metrics_path: str,
    run_id: str,
    input_snapshot_id: str,
    extract_fn,
    output_path: str | None = None,
) -> DataFrame:
    """Resume-aware execution: filter completed docs, extract the rest,
    write the output sink, THEN append lineage. Returns the newly parsed
    rows (persisted when an output sink is given).

    Commit-order invariant: lineage marks documents completed, so it must
    be the LAST write — a crash between output and lineage re-extracts
    those docs next run (at-least-once, duplicates in the output the
    caller dedups by doc_id / overwrites by partition), whereas
    lineage-first would silently skip them forever (data loss).
    """
    from pyspark.errors import AnalysisException

    try:
        done = completed_doc_ids(spark, metrics_path)
        todo = resume_filter(raw, done)
    except AnalysisException:  # first run: no metrics table yet
        todo = raw
    parsed = extract_fn(todo)
    parsed = parsed.persist()
    if output_path is not None:
        parsed.write.mode("append").parquet(output_path)
    write_lineage(parsed, metrics_path, run_id, input_snapshot_id)
    return parsed
