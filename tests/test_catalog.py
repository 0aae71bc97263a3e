"""Catalog shim: append/read round-trip + snapshot-id determinism."""

from __future__ import annotations

from agentic_doc_spark.sources.catalog import Catalog
from agentic_doc_spark.synth import corpus_df


def test_catalog_roundtrip_and_snapshots(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    assert not cat.exists("docs")
    assert cat.snapshot_id("docs") == "empty"

    df = corpus_df(spark, 1)
    cat.append(df, "docs")
    assert cat.exists("docs")
    s1 = cat.snapshot_id("docs")
    assert cat.read(spark, "docs").count() == df.count()
    assert cat.snapshot_id("docs") == s1  # stable when data unchanged

    cat.append(df.limit(2), "docs")
    s2 = cat.snapshot_id("docs")
    assert s2 != s1  # changes when data changes
    assert cat.read(spark, "docs").count() == df.count() + 2
