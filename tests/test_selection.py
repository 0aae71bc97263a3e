"""DSIR importance resampling (operators/selection.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from agentic_doc_spark.operators.selection import dsir_select, dsir_weights


def _corpus(spark):
    # target docs speak "alpha beta", pool docs speak "gamma delta";
    # one pool doc code-switches into target vocabulary
    rows = [
        (0, "alpha beta alpha beta", True),
        (1, "beta alpha beta alpha", True),
        (2, "gamma delta gamma delta", False),
        (3, "delta gamma delta gamma", False),
        (4, "alpha beta alpha gamma", False),  # target-like pool doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")


def test_dsir_weights_rank_target_vocabulary(spark):
    w = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(_corpus(spark), "is_t").collect()
    }
    # pure target-vocab docs outrank the mixed doc, which outranks
    # pure pool-vocab docs (absolute sign is smoothing-dependent on a
    # tiny corpus; the ranking is the contract)
    assert w[0] == w[1] and w[2] == w[3]
    assert w[0] > w[4] > w[2]


def test_dsir_select_topk_deterministic(spark):
    top = dsir_select(_corpus(spark), "is_t", k=3).collect()
    assert [r["doc_id"] for r in top] == [0, 1, 4]


def test_dsir_weights_partition_invariant(spark):
    docs = _corpus(spark)
    a = sorted(map(tuple, dsir_weights(docs, "is_t").collect()))
    b = sorted(
        map(tuple, dsir_weights(docs.repartition(7), "is_t").collect())
    )
    assert a == b


def test_domain_mix_rebalances_toward_small_domains(spark):
    from agentic_doc_spark.operators.selection import domain_mix

    # big: 90 docs × 100 tokens; small: 10 docs × 10 tokens
    rows = [(i, "big", 100) for i in range(90)] + [
        (100 + i, "small", 10) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, domain string, t long")
    out = domain_mix(docs, "domain", "t", temperature=0.5).toPandas()
    per = out.groupby("domain").size().to_dict()
    # T=0.5 flattens hard: the small domain must repeat (>1 copy/doc
    # on average), the big domain must drop documents
    assert per["small"] > 10 * 2
    assert per["big"] < 90
    # per-doc copy indexes are dense 1..k
    g = out.groupby("doc_id")["copy"].agg(["min", "max", "count"])
    assert (g["min"] == 1).all() and (g["max"] == g["count"]).all()


def test_domain_mix_identity_when_uniform(spark):
    from agentic_doc_spark.operators.selection import domain_mix

    # equal domains → rate 1.0 exactly → every doc exactly once
    rows = [(i, f"d{i % 4}", 50) for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, domain string, t long")
    out = domain_mix(docs, "domain", "t", temperature=0.7).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(80))
    assert all(r["copy"] == 1 for r in out)


def test_domain_mix_partition_invariant(spark):
    from agentic_doc_spark.operators.selection import domain_mix

    rows = [(i, "a" if i % 7 else "b", (i % 13) + 1) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, domain string, t long")
    a = sorted(map(tuple, domain_mix(docs, "domain", "t").collect()))
    b = sorted(
        map(tuple, domain_mix(docs.repartition(11), "domain", "t").collect())
    )
    assert a == b
