"""Custom stateful streaming operator: gap-based sessionization.

Demonstrates the applyInPandasWithState path for operators Spark lacks
natively: events stream in per user, and a session closes when the gap
since the last event exceeds ``gap``. Session state (start, last ts,
count, value sum) lives in the state store — it survives across
micro-batches and restarts via the checkpoint.

Scale: state is partitioned by user_id across executors (one shuffle,
AQE-skew-aware); per-group processing is a pandas frame per user per
batch, vectorized inside.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.TimestampType()),
        T.StructField("last", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _session_func(gap_seconds: float):
    def func(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        events = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        closed: list[tuple] = []
        for ts, value in zip(events["ts"], events["value"]):
            ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
            if last is not None and (ts - last).total_seconds() > gap_seconds:
                closed.append((user_id, start, last, n, total))
                start, n, total = ts, 0, 0.0
            if start is None:
                start = ts
            last = ts
            n += 1
            total += float(value)
        state.update((start, last, n, total))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "n_events",
                    "total_value",
                ],
            )

    return func


def sessionize_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    gap_minutes: float = 30.0,
    available_now: bool = True,
):
    """events parquet stream (user_id, ts, value, ...) → closed sessions."""
    schema = spark.read.parquet(input_path).schema
    src = spark.readStream.schema(schema).parquet(input_path)
    sessions = (
        src.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_func(gap_minutes * 60.0),
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
