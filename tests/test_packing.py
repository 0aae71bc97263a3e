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
