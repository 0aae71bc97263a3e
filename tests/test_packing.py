"""Distributed prefix-sum packing + deterministic stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from agentic_doc_spark.operators.packing import (
    pack_sequences,
    running_totals,
    sample_stratified,
)


def _tokens_df(spark, n=500):
    # deterministic pseudo-random token counts
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37 + 11) % 97 + 1).alias("n_tokens"),
    )


def test_running_totals_matches_sequential_cumsum(spark):
    df = _tokens_df(spark)
    got = {
        r["doc_id"]: r["running"]
        for r in running_totals(df, num_partitions=7).collect()
    }
    acc = 0
    for i in range(500):
        acc += (i * 37 + 11) % 97 + 1
        assert got[i] == acc, i


def test_running_totals_partition_invariant(spark):
    df = _tokens_df(spark, 300)
    a = sorted(map(tuple, running_totals(df, num_partitions=1).collect()))
    b = sorted(map(tuple, running_totals(df, num_partitions=13).collect()))
    assert a == b


def test_pack_sequences_bins(spark):
    df = _tokens_df(spark, 200)
    rows = pack_sequences(df, budget=256, num_partitions=5).collect()
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    # bin = exclusive prefix // budget: non-decreasing, starts at 0
    bins = [r["bin_id"] for r in by_id]
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    # every bin's token start boundary is honored
    for r in by_id:
        assert (r["running"] - r["n_tokens"]) // 256 == r["bin_id"]
    # total tokens ≈ budget × number of bins (each bin full except last)
    assert max(bins) == (sum(r["n_tokens"] for r in by_id) - 1) // 256


def test_sample_stratified_deterministic_and_rate(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    picked = sample_stratified(df, {"en": 0.5, "de": 0.1}, "lang")
    a = sorted(r["doc_id"] for r in picked.collect())
    b = sorted(r["doc_id"] for r in picked.collect())
    assert a == b  # no RNG state: same result every run
    en = sum(1 for i in a if i % 2 == 0) / 1000
    de = sum(1 for i in a if i % 2 == 1) / 1000
    assert 0.4 < en < 0.6 and 0.05 < de < 0.16
    # default rate 0 drops unknown strata entirely
    only_en = sample_stratified(df, {"en": 0.5}, "lang")
    assert all(r["lang"] == "en" for r in only_en.collect())


def test_materialize_bins_concatenates_in_order(spark):
    from agentic_doc_spark.operators.packing import (
        materialize_bins,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb", 2), (2, "cc", 1), (3, "dd ee ff", 3), (4, "gg", 1)],
        ["doc_id", "text", "n_tokens"],
    )
    packed = pack_sequences(docs, budget=3)
    rows = {r["bin_id"]: r for r in materialize_bins(packed).collect()}
    # prefix sums: 2,3,6,7 → bins 0,0,1,2 (doc starts where its first
    # token lands)
    assert rows[0]["text"] == "aa bb cc" and rows[0]["n_docs"] == 2
    assert rows[1]["text"] == "dd ee ff" and rows[1]["n_tokens"] == 3
    assert rows[2]["text"] == "gg"


def _interleaved_raw(spark):
    # 3 docs: known interleavings of text (costed by ws tokens) and
    # media spans (fixed placeholder budget)
    def t(text, off):
        return {"kind": "raw", "text": text, "media_ref": None, "offset": off}

    def m(ref, off):
        return {"kind": "raw", "text": "", "media_ref": ref, "offset": off}

    rows = [
        # T(2) M T(3) → sig TMT, cost 2+64+3
        {"doc_id": 1, "spans": [t("a b", 0), m("media://1/m0", 1), t("x y z", 2)]},
        # pure text: T(1) T(1) → TT, cost 2
        {"doc_id": 2, "spans": [t("p", 0), t("q", 1)]},
        # M M → MM, cost 128; offsets out of order on input
        {"doc_id": 3, "spans": [m("media://3/m1", 5), m("media://3/m0", 2)]},
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_interleaved_costs_and_signature(spark):
    from agentic_doc_spark.operators.packing import interleaved_costs

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_media"], r["sig"])
        for r in interleaved_costs(_interleaved_raw(spark), 64).collect()
    }
    assert got == {1: (69, 1, "TMT"), 2: (2, 0, "TT"), 3: (128, 2, "MM")}


def test_interleaved_costs_empty_span_docs_dont_corrupt_neighbors(spark):
    """A doc with spans=[] must vanish (explode equivalence) WITHOUT
    corrupting the preceding doc's segment sums — the reduceat segment
    boundaries must come from the kept docs only (regression: clipping
    an empty trailing start shrank the previous doc's segment)."""
    from agentic_doc_spark.operators.packing import interleaved_costs

    rows = [
        {
            "doc_id": 1,
            "spans": [
                {"kind": "raw", "text": "a b c", "media_ref": None, "offset": 0},
                {"kind": "raw", "text": "", "media_ref": "media://1/m0", "offset": 1},
            ],
        },
        {"doc_id": 2, "spans": []},
        {
            "doc_id": 3,
            "spans": [
                {"kind": "raw", "text": "d e", "media_ref": None, "offset": 0}
            ],
        },
        {"doc_id": 4, "spans": []},  # trailing empty after the last kept doc
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    ).coalesce(1)  # one Arrow batch: kept and empty docs adjacent
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_media"], r["sig"])
        for r in interleaved_costs(df, 64).collect()
    }
    assert got == {1: (67, 1, "TM"), 3: (2, 0, "T")}


def test_pack_interleaved_bins_and_layout(spark):
    from agentic_doc_spark.operators.packing import pack_interleaved

    rows = sorted(
        pack_interleaved(_interleaved_raw(spark), budget=70, media_tokens=64)
        .collect(),
        key=lambda r: r["bin_id"],
    )
    # doc1 cost 69 fills bin 0; doc2 (2 tokens) starts at 69 → bin 0;
    # doc3 (128) starts at 71 → bin 1
    assert [tuple(r) for r in rows] == [
        (0, 2, 71, 1, "TMT|TT"),
        (1, 1, 128, 2, "MM"),
    ]


def test_pack_interleaved_partition_invariant(spark):
    from agentic_doc_spark.operators.packing import pack_interleaved

    raw = _interleaved_raw(spark)
    a = sorted(
        map(tuple, pack_interleaved(raw, 70, 64, num_partitions=1).collect())
    )
    b = sorted(
        map(tuple, pack_interleaved(raw, 70, 64, num_partitions=7).collect())
    )
    assert a == b


def test_pack_interleaved_matches_python_reference(spark):
    # property-style pin against an independent sequential reference
    # over a pseudo-random interleaved corpus
    import random

    from agentic_doc_spark.operators.packing import pack_interleaved

    rng = random.Random(17)
    docs = []
    for i in range(60):
        spans = []
        off = 0
        for _ in range(rng.randint(1, 6)):
            if rng.random() < 0.3:
                spans.append(
                    {"kind": "raw", "text": "", "media_ref": f"m://{i}/{off}",
                     "offset": off}
                )
            else:
                nw = rng.randint(1, 9)
                spans.append(
                    {"kind": "raw",
                     "text": " ".join(f"w{j}" for j in range(nw)),
                     "media_ref": None, "offset": off}
                )
            off += 1
        docs.append({"doc_id": i, "spans": spans})

    budget, mtok = 100, 16
    # reference: sequential prefix sum over doc_id order
    ref_bins: dict[int, dict] = {}
    running = 0
    for d in sorted(docs, key=lambda x: x["doc_id"]):
        cost = sum(
            mtok if s["media_ref"] else len(s["text"].split(" "))
            for s in d["spans"]
        )
        sig = "".join(
            "M" if s["media_ref"] else "T"
            for s in sorted(d["spans"], key=lambda s: s["offset"])
        )
        bin_id = running // budget
        running += cost
        b = ref_bins.setdefault(
            bin_id, {"n_docs": 0, "n_tokens": 0, "n_media": 0, "sigs": []}
        )
        b["n_docs"] += 1
        b["n_tokens"] += cost
        b["n_media"] += sum(1 for s in d["spans"] if s["media_ref"])
        b["sigs"].append(sig)

    raw = spark.createDataFrame(
        docs,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        r["bin_id"]: r
        for r in pack_interleaved(raw, budget, mtok, num_partitions=5)
        .collect()
    }
    assert set(got) == set(ref_bins)
    for bid, ref in ref_bins.items():
        r = got[bid]
        assert r["n_docs"] == ref["n_docs"]
        assert r["n_tokens"] == ref["n_tokens"]
        assert r["n_media"] == ref["n_media"]
        assert r["sig"] == "|".join(ref["sigs"])


def test_strip_media_boilerplate(spark):
    from pyspark.sql import functions as F

    from agentic_doc_spark.operators.multimodal import (
        strip_media_boilerplate,
    )

    span = "kind string, text string, media_ref string, offset int"
    rows = [
        ("a", [("raw", "t0", None, 0), ("raw", "", "logo.png", 1),
               ("raw", "t1", None, 2), ("raw", "", "fig-a.png", 3)]),
        ("b", [("raw", "u0", None, 0), ("raw", "", "logo.png", 1)]),
        ("c", [("raw", "v0", None, 0), ("raw", "", "logo.png", 1),
               ("raw", "", "fig-c.png", 2)]),
    ]
    docs = spark.createDataFrame(
        rows, f"doc_id string, spans array<struct<{span}>>"
    )
    # logo.png appears in 3 docs > max_doc_freq=2 → dropped everywhere;
    # per-doc figures survive with order and offsets untouched
    out = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in strip_media_boilerplate(docs, max_doc_freq=2).collect()
    }
    assert out["a"] == [("raw", "t0", None, 0), ("raw", "t1", None, 2),
                        ("raw", "", "fig-a.png", 3)]
    assert out["b"] == [("raw", "u0", None, 0)]
    assert out["c"] == [("raw", "v0", None, 0), ("raw", "", "fig-c.png", 2)]

    # nothing hot → frame returned unchanged (no rewrite at all)
    same = strip_media_boilerplate(docs, max_doc_freq=3)
    assert same is docs

    # a threshold that matches far more than boilerplate raises
    import pytest as _pytest

    many = spark.createDataFrame(
        [(str(i), [("raw", "", f"m{i}.png", 0)]) for i in range(30)],
        f"doc_id string, spans array<struct<{span}>>",
    )
    with _pytest.raises(ValueError, match="max_doc_freq"):
        strip_media_boilerplate(many, max_doc_freq=0, max_hot_keys=10)


def test_strip_media_boilerplate_null_key_keeps_span(spark):
    # a NULL content key (e.g. an undecodable image's hash) must KEEP
    # the span — the three-valued-logic trap would drop exactly the
    # non-boilerplate spans
    from pyspark.sql import functions as F

    from agentic_doc_spark.operators.multimodal import (
        strip_media_boilerplate,
    )

    span = "kind string, text string, media_ref string, offset int"
    rows = [
        ("a", [("raw", "", "logo", 0)]),
        ("b", [("raw", "", "logo", 0), ("raw", "", "odd", 1)]),
    ]
    docs = spark.createDataFrame(
        rows, f"doc_id string, spans array<struct<{span}>>"
    )
    # key maps 'odd' to NULL; 'logo' (2 docs > 1) is hot
    key = lambda s: F.when(  # noqa: E731
        s["media_ref"] != "odd", s["media_ref"]
    )
    out = {
        r["doc_id"]: [s["media_ref"] for s in r["spans"]]
        for r in strip_media_boilerplate(docs, 1, key=key).collect()
    }
    assert out["a"] == [] and out["b"] == ["odd"]
