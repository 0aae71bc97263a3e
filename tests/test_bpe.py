"""Distributed BPE training/application vs an independent reference.

The reference applies merges sequentially in rank order (the textbook
formulation); the engine's encoder applies the lowest-rank applicable
merge repeatedly — the two are equivalent, so agreement pins both.
"""

from __future__ import annotations

from agentic_doc_spark.operators.bpe import (
    END,
    apply_bpe,
    encode_word,
    merges_from_counts,
    train_bpe,
)


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [END]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_merges_from_counts_classic_example():
    merges = merges_from_counts(SENNRICH, 3)
    # (e,s)/(s,t)/(t,</w>) all have weight 9; ties break to the
    # lexicographically smallest pair, then cascade
    assert merges == [("e", "s"), ("es", "t"), ("est", END)]


def test_encode_word_matches_sequential_reference():
    merges = merges_from_counts(SENNRICH, 10)
    for w, _ in SENNRICH + [("lowest", 0), ("news", 0), ("", 0), ("x", 0)]:
        assert encode_word(w, {p: i for i, p in enumerate(merges)}) == (
            _ref_encode(w, merges)
        ), w


def test_train_and_apply_on_dataframe(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(w for w, c in SENNRICH for _ in range(c)))
         for i in range(4)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=5)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", END)]
    rows = apply_bpe(docs, merges).collect()
    assert len(rows) == 4
    ranks = {p: i for i, p in enumerate(merges)}
    exp_words = sum(c for _, c in SENNRICH)
    exp_bpe = sum(len(encode_word(w, ranks)) * c for w, c in SENNRICH)
    for r in rows:
        assert r["n_words"] == exp_words
        assert r["n_bpe_tokens"] == exp_bpe
    # merging strictly compresses vs characters, never below word count
    assert exp_words < exp_bpe < sum((len(w) + 1) * c for w, c in SENNRICH)


def test_train_bpe_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, "ab ab abc bcd bcd bcd") for i in range(20)],
        "doc_id long, text string",
    )
    assert train_bpe(docs, 6) == train_bpe(docs.repartition(7), 6)


def test_apply_bpe_preserves_string_ids(spark):
    docs = spark.createDataFrame(
        [("doc-a", "low low"), ("doc-b", "newest")],
        "doc_id string, text string",
    )
    merges = merges_from_counts(SENNRICH, 3)
    got = {r["doc_id"]: r["n_words"] for r in apply_bpe(docs, merges).collect()}
    assert got == {"doc-a": 2, "doc-b": 1}
