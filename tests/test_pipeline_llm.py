"""End-to-end training-set builder: every pipeline stage exercised on a
corpus with one planted case per stage."""

from __future__ import annotations

from agentic_doc_spark.pipeline_llm import build_training_set

GOOD_A = (
    "the river flows past the old mill and the stones remember every "
    "season while the children walk along the bank and count the boats "
    "drifting slowly toward the northern bridge in the morning light"
)
GOOD_B = (
    "a completely different report describes the harvest and the market "
    "where farmers trade grain and the carts arrive before dawn so the "
    "sellers can arrange their stalls along the square in neat rows"
)
CONTAMINATED = (
    "this passage mentions the zebra quantum lattice experiment and then "
    "continues with several more sentences about the laboratory and the "
    "long afternoon spent recording measurements in the notebook pages"
)
BENCHMARK = "which result did the zebra quantum lattice experiment produce"


def test_build_training_set_all_stages(spark):
    corpus = spark.createDataFrame(
        [
            (1, GOOD_A),
            (2, GOOD_A),  # exact dupe of 1 → dropped
            (3, GOOD_A.replace("boats", "ships")),  # near-dupe → dropped
            (4, GOOD_B),
            (5, "short"),  # low quality → dropped
            (6, CONTAMINATED),  # shares benchmark shingles → dropped
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(BENCHMARK,)], ["text"])
    # stage attribution first: with ONLY quality + exact dedup on, the
    # planted near-dupe (3) and contaminated doc (6) must still be alive
    # — otherwise the full-pipeline assertion below would not actually
    # exercise near-dedup / decontamination
    partial = build_training_set(
        corpus, min_quality=0.6, near_dup_threshold=None, pack_budget=None
    )
    assert sorted(r["doc_id"] for r in partial.collect()) == [1, 3, 4, 6]
    out = build_training_set(
        corpus, benchmark=bench, pack_budget=16, min_quality=0.6
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert sorted(rows) == [1, 4]  # 3 near-deduped, 6 decontaminated
    for r in rows.values():
        assert r["pred_lang"] == "en" and r["quality"] >= 0.6
        assert r["n_tokens"] > 16  # multi-bin packing exercised
    # packing: doc 1 starts at bin 0; doc 4 starts where doc 1's tokens end
    assert rows[1]["bin_id"] == 0
    assert rows[4]["bin_id"] == rows[1]["n_tokens"] // 16


def test_build_training_set_stages_toggle_off(spark):
    corpus = spark.createDataFrame(
        [(1, GOOD_A), (2, GOOD_A)], ["doc_id", "text"]
    )
    out = build_training_set(
        corpus,
        min_quality=None,
        near_dup_threshold=None,
        pack_budget=None,
        lang_rates=None,
    )
    # exact dedup still runs (always on): one survivor, no bin columns
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert "bin_id" not in out.columns and "n_tokens" in out.columns


def test_build_training_set_repetition_and_scrub(spark):
    repetitive = ("the same words repeat " * 12) + "and the tail differs here"
    with_pii = (
        GOOD_B + " contact the clerk at market.clerk@example.com for stalls"
    )
    corpus = spark.createDataFrame(
        [(1, GOOD_A), (2, repetitive), (3, with_pii)], ["doc_id", "text"]
    )
    out = build_training_set(
        corpus,
        min_quality=None,
        near_dup_threshold=None,
        max_rep_ratio=0.5,  # the repeated doc far exceeds this
        scrub=True,
        pack_budget=None,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert sorted(rows) == [1, 3]  # 2 dropped by the repetition gate
    assert "<EMAIL>" in rows[3]["text"]  # PII masked in the output text
    assert "example.com" not in rows[3]["text"]


def test_build_training_set_resumable_crash_after_dedup(spark, tmp_path, monkeypatch):
    # crash between the dedup stage commit and the final stage, resume
    # with the same run_id: (1) the dedup chain must NOT re-run, (2) the
    # final output must be byte-identical to an uninterrupted run
    import agentic_doc_spark.pipeline_llm as P

    corpus = spark.createDataFrame(
        [
            (1, GOOD_A),
            (2, GOOD_A),
            (3, GOOD_A.replace("boats", "ships")),
            (4, GOOD_B),
            (6, CONTAMINATED),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(BENCHMARK,)], ["text"])
    kwargs = dict(
        benchmark=bench, pack_budget=16, min_quality=0.6, scrub=True
    )

    # uninterrupted reference run (its own work dir)
    ref = P.build_training_set_resumable(
        spark, corpus, work_dir=str(tmp_path / "ref"), run_id="r0", **kwargs
    )
    ref_rows = sorted(
        map(tuple, ref.collect()), key=lambda t: t[0]
    )
    assert [t[0] for t in ref_rows] == [1, 4]

    # crashed run: die right after the dedup stage commits
    real_finalize = P._finalize_stage
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("injected crash at packing stage")

    monkeypatch.setattr(P, "_finalize_stage", boom)
    import pytest

    with pytest.raises(RuntimeError, match="injected crash"):
        P.build_training_set_resumable(
            spark, corpus, work_dir=str(tmp_path / "wd"), run_id="r1", **kwargs
        )
    assert calls["n"] == 1

    # resume: the dedup stage must be read back, not recomputed
    def dedup_bomb(*a, **k):
        raise AssertionError("dedup stage re-ran on resume")

    monkeypatch.setattr(P, "_finalize_stage", real_finalize)
    monkeypatch.setattr(P, "_dedup_stage", dedup_bomb)
    out = P.build_training_set_resumable(
        spark, corpus, work_dir=str(tmp_path / "wd"), run_id="r1", **kwargs
    )
    got = sorted(map(tuple, out.collect()), key=lambda t: t[0])
    assert list(out.columns) == list(ref.columns)
    assert got == ref_rows
    # idempotent re-read: calling again re-runs nothing at all
    again = P.build_training_set_resumable(
        spark, corpus, work_dir=str(tmp_path / "wd"), run_id="r1", **kwargs
    )
    assert sorted(map(tuple, again.collect()), key=lambda t: t[0]) == ref_rows


def test_build_training_set_language_mixing(spark):
    # stratified sampling keeps ~rate per predicted language
    docs = [(i, GOOD_A + f" extra token {i}") for i in range(200)]
    corpus = spark.createDataFrame(docs, ["doc_id", "text"])
    out = build_training_set(
        corpus,
        near_dup_threshold=None,  # the shared prefix is intentional here
        lang_rates={"en": 0.4},
        pack_budget=None,
    )
    n = out.count()
    assert 50 < n < 110  # ~0.4 of 200 with md5-hash determinism
    again = build_training_set(
        corpus, near_dup_threshold=None, lang_rates={"en": 0.4}, pack_budget=None
    )
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in out.collect()
    )


def test_build_training_set_substring_removal(spark):
    # dedup_substrings_k: a passage duplicated ACROSS two surviving docs
    # is cut from both texts (whitespace-normalized), leaving the rest
    shared = "november oscar papa quebec romeo sierra tango uniform victor whiskey"
    corpus = spark.createDataFrame(
        [
            (1, GOOD_A + " " + shared),
            (2, GOOD_B + " " + shared + " trailing unique tail words here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in build_training_set(
            corpus,
            min_quality=None,
            near_dup_threshold=None,
            dedup_substrings_k=8,
            pack_budget=None,
        ).collect()
    }
    assert sorted(out) == [1, 2]
    for t in out.values():
        assert "november" not in t and "whiskey" not in t
    assert out[1] == GOOD_A
    assert out[2].endswith("trailing unique tail words here")


def test_interleaved_training_set_gates_and_packs(spark):
    from pyspark.sql import functions as F

    from agentic_doc_spark.pipeline_llm import build_interleaved_training_set

    good = (
        "the fast key order sort table scan merge part window small "
        "hash join spark group query row data slow filter customer "
        "line batch value page span chunk figure layout grounding "
        "extract markdown document parse the fast key order sort "
        "table scan merge part window small hash join spark group"
    )

    def t(text, off):
        return {"kind": "raw", "text": text, "media_ref": None, "offset": off}

    def m(ref, off):
        return {"kind": "raw", "text": "", "media_ref": ref, "offset": off}

    rows = [
        # doc 1: good text + one image
        {"doc_id": 1, "spans": [t(good, 0), m("media://1/m0", 1)]},
        # doc 2: exact duplicate TEXT of doc 1 (different media) → dropped
        {"doc_id": 2, "spans": [t(good, 0), m("media://2/m0", 1)]},
        # doc 3: junk text (all punctuation → quality < 0.3) → dropped
        {"doc_id": 3, "spans": [t("!!! ??? ### $$$ %%% ^^^", 0)]},
        # doc 4: good text, no media
        {"doc_id": 4, "spans": [t(good + " extra tail words here", 0)]},
    ]
    raw = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    bins = build_interleaved_training_set(
        raw, min_quality=0.3, pack_budget=4096, media_tokens=64
    ).collect()
    # survivors: docs 1 and 4 only; everything fits one bin
    assert len(bins) == 1
    b = bins[0]
    assert b["n_docs"] == 2
    assert b["n_media"] == 1
    assert b["sig"] == "TM|T"
