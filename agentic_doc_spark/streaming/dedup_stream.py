"""Stateful streaming dedup: exact-dup suppression across micro-batches.

The streaming twin of operators/dedup.dedup_exact — a growing corpus is
deduplicated as it arrives using Spark's streaming state store:
fingerprint (md5 of normalized text) → ``dropDuplicates`` keeps the first
occurrence ever seen, across batches and restarts (state lives in the
checkpoint).

Scale notes: state is keyed by the 32-char fingerprint only (not the
text), so 10^12 documents cost ~32 TB of state spread over the cluster's
state stores — bound it with a watermark on an event-time column
(``dropDuplicatesWithinWatermark``) when exact-forever semantics aren't
required.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from agentic_doc_spark.functions.textstats import fingerprint


def stream_dedup_exact(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    available_now: bool = True,
):
    """File stream of (doc_id, text, ...) → append sink of first-seen rows.

    Schema is inferred from the existing files at start (file streams
    need a fixed schema)."""
    schema = spark.read.parquet(input_path).schema
    src = spark.readStream.schema(schema).parquet(input_path)
    deduped = (
        src.withColumn("fingerprint", fingerprint(F.col(text_col)))
        .dropDuplicates(["fingerprint"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_dedup_within_watermark(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Bounded-state variant: duplicates are suppressed only within the
    watermark horizon — state for fingerprints older than the watermark is
    evicted, so state size is O(arrival rate × horizon) instead of
    O(corpus). The right tool when the corpus is unbounded and duplicates
    cluster in time (crawl re-fetches, retries)."""
    schema = spark.read.parquet(input_path).schema
    src = spark.readStream.schema(schema).parquet(input_path)
    deduped = (
        src.withColumn("fingerprint", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
