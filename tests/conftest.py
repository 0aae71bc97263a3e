"""Shared SparkSession for the test suite (session-scoped, local mode)."""

from __future__ import annotations

import pytest

from agentic_doc_spark.config import build_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("spark_warehouse")
    s = build_spark(
        app_name="agentic-doc-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s
    s.stop()
