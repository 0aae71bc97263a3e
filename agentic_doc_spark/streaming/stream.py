"""Incremental extraction over a growing documents_raw table.

The pipeline is per-document (no cross-document windows), so the idiomatic
Structured Streaming shape is a file/table stream + ``foreachBatch``: each
micro-batch runs the SAME batch plan (pipeline.extract) and appends results
+ lineage atomically per epoch. Checkpointing gives exactly-once sink
appends; the lineage table additionally enables exact cross-run resume
(operators/lineage.py) even if the checkpoint is lost — the anti-join path.

This mirrors the reference's incremental posture (idempotent re-runs via
timestamped results, agentic_doc/parse.py:453-467) with real streaming
semantics. Watermark/stateful operators are intentionally absent: nothing
in the reference's semantics is time-windowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from agentic_doc_spark.config import DEFAULT_SETTINGS, Settings
from agentic_doc_spark.operators.lineage import lineage_rows
from agentic_doc_spark.pipeline import extract
from agentic_doc_spark.schema import DOCUMENTS_RAW


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    metrics_path: str | None = None,
    run_id: str = "stream",
    settings: Settings = DEFAULT_SETTINGS,
    available_now: bool = True,
):
    """Start (and by default drain) the incremental extraction stream.

    input_path: parquet directory receiving documents_raw files.
    available_now=True processes the backlog then stops — the batch-ish
    trigger used in tests and backfills; False runs continuously."""
    src = (
        spark.readStream.schema(DOCUMENTS_RAW)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        parsed = extract(batch_df, settings).persist()
        try:
            parsed.write.mode("append").parquet(output_path)
            if metrics_path is not None:
                lineage_rows(
                    parsed, f"{run_id}-epoch{epoch_id}", f"epoch-{epoch_id}"
                ).write.mode("append").parquet(metrics_path)
        finally:
            parsed.unpersist()

    writer = (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
