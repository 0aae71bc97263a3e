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
