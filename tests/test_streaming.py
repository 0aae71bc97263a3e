"""Structured Streaming front-end: backlog drain, incremental batches,
exactly-once via checkpoint."""

from __future__ import annotations

import datetime as dt

from agentic_doc_spark.streaming.dedup_stream import stream_dedup_exact
from agentic_doc_spark.streaming.sessionize import sessionize_stream


def test_stream_dedup_within_watermark(spark, tmp_path):
    from agentic_doc_spark.streaming.dedup_stream import (
        stream_dedup_within_watermark,
    )

    src = str(tmp_path / "w_in")
    out = str(tmp_path / "w_out")
    ckpt = str(tmp_path / "w_ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # two micro-batches: within ONE batch "first occurrence" is arbitrary
    # (partition order), so the deterministic contract is cross-batch —
    # doc 1 arrives in batch 1, its duplicate doc 2 in batch 2 is
    # suppressed by the state store while inside the watermark horizon
    b1 = [(1, t0, "same text")]
    spark.createDataFrame(b1, ["doc_id", "ts", "text"]).write.mode(
        "append"
    ).parquet(src)
    stream_dedup_within_watermark(spark, src, out, ckpt, watermark="1 hour")
    b2 = [
        (2, t0 + dt.timedelta(minutes=5), "same text"),  # dup within horizon
        (3, t0 + dt.timedelta(minutes=10), "other text"),
    ]
    spark.createDataFrame(b2, ["doc_id", "ts", "text"]).write.mode(
        "append"
    ).parquet(src)
    stream_dedup_within_watermark(spark, src, out, ckpt, watermark="1 hour")
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 3}


def test_sessionize_stateful_across_batches(spark, tmp_path):
    src = str(tmp_path / "ev_in")
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(uid, minutes, value):
        return (uid, t0 + dt.timedelta(minutes=minutes), float(value))

    # batch 1: user 1 has events at 0,5 then a 90-min gap candidate later
    b1 = [ev(1, 0, 10), ev(1, 5, 10), ev(2, 0, 1)]
    spark.createDataFrame(b1, ["user_id", "ts", "value"]).write.mode(
        "append"
    ).parquet(src)
    sessionize_stream(spark, src, out, ckpt, gap_minutes=30)
    assert spark.read.parquet(out).count() == 0  # nothing closed yet

    # batch 2: user 1 resumes 90 min later → first session closes with the
    # state carried across batches (2 events, total 20)
    b2 = [ev(1, 95, 5), ev(1, 100, 5)]
    spark.createDataFrame(b2, ["user_id", "ts", "value"]).write.mode(
        "append"
    ).parquet(src)
    sessionize_stream(spark, src, out, ckpt, gap_minutes=30)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    s = rows[0]
    assert s["user_id"] == 1 and s["n_events"] == 2 and s["total_value"] == 20.0
    assert s["session_end"] == t0 + dt.timedelta(minutes=5)
def test_sessionize_batch_equals_streaming_fold(spark):
    # the vectorized batch operator must produce EXACTLY the sessions
    # the streaming kernel's per-event fold yields when every user's
    # events arrive in one stream that then ends (final session closes)
    import random

    import pandas as pd

    from agentic_doc_spark.streaming.sessionize import (
        _fold_events,
        sessionize_batch,
    )

    rng = random.Random(5)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(1, 8):
        minutes = 0.0
        for _ in range(rng.randint(1, 40)):
            minutes += rng.choice([1, 5, 29, 31, 200])
            rows.append(
                (eid, uid, t0 + dt.timedelta(minutes=minutes),
                 round(rng.uniform(0, 100), 2))
            )
            eid += 1
    rng.shuffle(rows)
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = sorted(
        (r["user_id"], r["session_no"], r["session_start"],
         r["session_end"], r["n_events"], round(r["total_value"], 6))
        for r in sessionize_batch(ev, gap_minutes=30.0).collect()
    )
    want = []
    for uid in sorted({r[1] for r in rows}):
        mine = sorted(
            [r for r in rows if r[1] == uid], key=lambda r: (r[2], r[0])
        )
        pdf = pd.DataFrame(
            {"ts": [r[2] for r in mine], "value": [r[3] for r in mine]}
        )
        closed, (start, last, n, total) = _fold_events(
            uid, pdf, None, 1800.0
        )
        if start is not None:
            closed.append((uid, start, last, n, total))
        for sno, (u, s, e, n_, tot) in enumerate(closed, start=1):
            want.append((u, sno, s, e, n_, round(tot, 6)))
    assert got == sorted(want)


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


def test_stream_extract_replay_idempotent(spark, tmp_path):
    # a replayed epoch (crash before checkpoint commit) must not duplicate
    # parsed rows OR lineage rows — epoch-partition OVERWRITE commit
    from agentic_doc_spark.streaming.stream import _process_extract_batch

    out = str(tmp_path / "re_out")
    metrics = str(tmp_path / "re_metrics")
    batch = corpus_df(spark, 1)
    n_docs = batch.count()

    _process_extract_batch(batch, 0, out, metrics, "stream")
    assert spark.read.parquet(out).count() == n_docs
    m1 = spark.read.parquet(metrics).collect()

    # replay the SAME epoch with the same data
    _process_extract_batch(batch, 0, out, metrics, "stream")
    got = spark.read.parquet(out)
    assert got.count() == n_docs
    assert got.select("doc_id").distinct().count() == n_docs
    m2 = spark.read.parquet(metrics).collect()
    assert len(m2) == len(m1)
    assert sorted(i for r in m2 for i in r["doc_ids_completed"]) == sorted(
        i for r in m1 for i in r["doc_ids_completed"]
    )


def test_stream_extract_fresh_run_id_preserves_prior_output(spark, tmp_path):
    # checkpoint loss restarts epoch numbering at 0: a NEW run_id's epoch
    # 0 must not overwrite the previous run's committed epoch-0 partition
    from agentic_doc_spark.streaming.stream import _process_extract_batch

    out = str(tmp_path / "fr_out")
    full = corpus_df(spark, 1).cache()
    ids = [r["doc_id"] for r in full.select("doc_id").collect()]
    b1 = full.filter(full.doc_id.isin(ids[:3]))
    b2 = full.filter(full.doc_id.isin(ids[3:]))

    _process_extract_batch(b1, 0, out, None, "run-a")
    _process_extract_batch(b2, 0, out, None, "run-b")  # fresh run, epoch 0
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == set(ids)  # run-a's epoch 0 survived run-b's epoch 0


def test_windowed_counts_late_data(spark, tmp_path):
    # watermarked tumbling windows: a window is emitted once finalized,
    # and an event later than the watermark horizon is dropped from it
    from agentic_doc_spark.streaming.windows import stream_windowed_counts

    src = str(tmp_path / "wc_in")
    out = str(tmp_path / "wc_out")
    ckpt = str(tmp_path / "wc_ckpt")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(minutes, typ, value):
        return (t0 + dt.timedelta(minutes=minutes), typ, float(value))

    cols = ["ts", "event_type", "value"]
    # batch 1: two events in the 10:00 window; one at 12:30 pushes the
    # watermark to 11:30 (> 11:00) so the 10:00 window can finalize
    b1 = [ev(5, "click", 1), ev(20, "click", 2), ev(150, "view", 5)]
    spark.createDataFrame(b1, cols).write.mode("append").parquet(src)
    stream_windowed_counts(spark, src, out, ckpt)

    # batch 2: a LATE click at 10:40 (behind the 11:30 watermark → must be
    # dropped) plus a fresh event that keeps the stream moving
    b2 = [ev(40, "click", 100), ev(240, "view", 7)]
    spark.createDataFrame(b2, cols).write.mode("append").parquet(src)
    stream_windowed_counts(spark, src, out, ckpt)

    rows = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    # the 10:00 click window finalized WITHOUT the late event
    assert rows[(t0, "click")] == (2, 3.0)
    # the late 10:40 click never created or modified an emitted window
    assert all(n != 1 or tv != 100.0 for n, tv in rows.values())


def test_stream_near_dedup_incremental(spark, tmp_path):
    # LSH-banded near-dup suppression across micro-batches: a later
    # near-identical doc collides with the accepted state and is dropped;
    # within a batch the lowest id of a colliding bucket wins
    from agentic_doc_spark.streaming.dedup_stream import stream_near_dedup

    src = str(tmp_path / "nd_in")
    out = str(tmp_path / "nd_out")
    ckpt = str(tmp_path / "nd_ckpt")
    state = str(tmp_path / "nd_state")

    tx = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while seven ships sail slowly past the old stone bridge"
    )
    ty = (
        "completely different subject matter about spark physical plans "
        "and shuffle partitions under adaptive query execution settings"
    )
    tz = (
        "a third unrelated passage describing parquet row groups column "
        "chunks page headers and dictionary encoded binary data layouts"
    )
    b1 = [(1, tx), (2, ty)]
    spark.createDataFrame(b1, ["doc_id", "text"]).write.mode("append").parquet(src)
    stream_near_dedup(spark, src, out, ckpt, state)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 2}

    # batch 2: 3 is a near-clone of 1 (one word changed) → dropped by
    # state collision; 4 is new; 5 is an exact clone of 4 in the SAME
    # batch → in-batch bucket minimum keeps 4
    b2 = [(3, tx.replace("seven", "nine")), (4, tz), (5, tz)]
    spark.createDataFrame(b2, ["doc_id", "text"]).write.mode("append").parquet(src)
    stream_near_dedup(spark, src, out, ckpt, state)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 4}
    # state holds bands only for accepted docs
    sdocs = {r["doc_id"] for r in spark.read.parquet(state).select("doc_id").distinct().collect()}
    assert sdocs == {1, 2, 4}


def test_stream_near_dedup_fresh_run_id_preserves_prior_output(spark, tmp_path):
    # checkpoint loss restarts epochs at 0: a NEW run_id must not clobber
    # the prior run's epoch-0 output or band state
    from agentic_doc_spark.streaming.dedup_stream import (
        _process_near_dedup_batch,
    )

    out = str(tmp_path / "fr_out")
    state = str(tmp_path / "fr_state")
    b1 = spark.createDataFrame(
        [(1, "an entirely original passage about run id partitioning")],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [(2, "a different body of words for the second streaming run")],
        ["doc_id", "text"],
    )
    _process_near_dedup_batch(spark, b1, 0, out, state, run_id="run-a")
    _process_near_dedup_batch(spark, b2, 0, out, state, run_id="run-b")
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2]  # run-a's epoch 0 survived run-b's epoch 0
    # and run-b still saw run-a's state: a clone of doc 1 is suppressed
    b3 = spark.createDataFrame(
        [(3, "an entirely original passage about run id partitioning")],
        ["doc_id", "text"],
    )
    _process_near_dedup_batch(spark, b3, 1, out, state, run_id="run-b")
    final = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert final == [1, 2]


def test_stream_near_dedup_replay_idempotent(spark, tmp_path):
    # a replayed epoch (crash before checkpoint commit) must neither
    # duplicate output rows nor make docs collide with their own prior
    # half-committed attempt
    from agentic_doc_spark.streaming.dedup_stream import (
        _process_near_dedup_batch,
    )

    out = str(tmp_path / "r_out")
    state = str(tmp_path / "r_state")
    batch = spark.createDataFrame(
        [
            (1, "a very particular sentence about streaming replay safety"),
            (2, "some other entirely unrelated body of words goes here"),
        ],
        ["doc_id", "text"],
    )
    _process_near_dedup_batch(spark, batch, 0, out, state)
    first = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert first == [1, 2]
    # replay the SAME epoch with the same data
    _process_near_dedup_batch(spark, batch, 0, out, state)
    again = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert again == [1, 2]  # no duplicates, no self-collision wipeout
    # a LATER epoch still sees epoch-0 state: a clone of doc 1 is dropped
    b2 = spark.createDataFrame(
        [(3, "a very particular sentence about streaming replay safety")],
        ["doc_id", "text"],
    )
    _process_near_dedup_batch(spark, b2, 1, out, state)
    final = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert final == [1, 2]


def test_stream_extract_interleaved_media_docs(spark, tmp_path):
    # interleaved text+media documents stream through extraction with
    # media spans preserved in order — the multimodal corpus shape is
    # first-class in the streaming path too
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def t(text, off):
        return {"kind": "raw", "text": text, "media_ref": None, "offset": off}

    def m(ref, off):
        return {"kind": "raw", "text": "", "media_ref": ref, "offset": off}

    rows = [
        {"doc_id": "mm-0", "spans": [t("alpha beta", 0), m("media://mm-0/x", 1),
                                     t("gamma delta", 2)]},
        {"doc_id": "mm-1", "spans": [m("media://mm-1/a", 0), t("solo", 1)]},
    ]
    from agentic_doc_spark.schema import DOCUMENTS_RAW

    spark.createDataFrame(rows, DOCUMENTS_RAW).write.mode("append").parquet(src)
    stream_extract(spark, src, out, ckpt)
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"mm-0", "mm-1"}
    s0 = [(s["kind"], s["media_ref"]) for s in got["mm-0"]["spans"]]
    assert s0 == [("text", None), ("media", "media://mm-0/x"),
                  ("text", None)]
    s1 = [(s["kind"], s["media_ref"]) for s in got["mm-1"]["spans"]]
    assert s1 == [("media", "media://mm-1/a"), ("text", None)]
