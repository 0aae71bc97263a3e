"""Shared SparkSession for the test suite (session-scoped, local mode)."""

from __future__ import annotations

import pytest

from agentic_doc_spark.config import build_spark


@pytest.fixture(scope="session")
def spark():
    s = build_spark(
        app_name="agentic-doc-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()
