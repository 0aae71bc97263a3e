"""Structured Streaming front-end: backlog drain, incremental batches,
exactly-once via checkpoint."""

from __future__ import annotations

from agentic_doc_spark.streaming.dedup_stream import stream_dedup_exact
from agentic_doc_spark.streaming.stream import stream_extract
from agentic_doc_spark.synth import corpus_df, expected_corpus


def test_stream_dedup_exact_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(1, "the same text"), (2, "other text"), (3, "THE  same text")]
    rows2 = [(4, "the same text"), (5, "brand new text")]  # 4 is a dup of 1
    spark.createDataFrame(rows1, ["doc_id", "text"]).write.mode("append").parquet(src)
    stream_dedup_exact(spark, src, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 2  # 3 normalizes to 1's fingerprint

    spark.createDataFrame(rows2, ["doc_id", "text"]).write.mode("append").parquet(src)
    stream_dedup_exact(spark, src, out, ckpt)
    final = spark.read.parquet(out)
    # state store remembered batch-1 fingerprints across runs
    assert final.count() == 3
    assert 4 not in {r["doc_id"] for r in final.collect()}


def test_stream_extract_incremental(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    metrics = str(tmp_path / "metrics")

    full = corpus_df(spark, 2).cache()
    ids = [r["doc_id"] for r in full.select("doc_id").collect()]
    first, second = ids[: len(ids) // 2], ids[len(ids) // 2 :]

    full.filter(full.doc_id.isin(first)).write.mode("append").parquet(src)
    stream_extract(spark, src, out, ckpt, metrics_path=metrics)
    assert spark.read.parquet(out).count() == len(first)

    # drop in more files; rerun processes ONLY the new ones
    full.filter(full.doc_id.isin(second)).write.mode("append").parquet(src)
    stream_extract(spark, src, out, ckpt, metrics_path=metrics)
    got = spark.read.parquet(out)
    assert got.count() == len(ids)
    assert got.select("doc_id").distinct().count() == len(ids)

    # streamed results equal the batch oracle on span sequences
    want = {
        d["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]
        ]
        for d in expected_corpus(2)
    }
    for r in got.collect():
        seq = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        assert seq == want[r["doc_id"]], r["doc_id"]

    # lineage rows landed per epoch
    m = spark.read.parquet(metrics)
    all_done = sorted(i for row in m.collect() for i in row["doc_ids_completed"])
    assert all_done == sorted(ids)
