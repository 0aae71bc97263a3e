"""Plan-shape regression guards: the scale-critical physical-plan
invariants that PLANS.md documents, pinned so a future edit that
silently reintroduces an exchange, a sort-merge join, or an extra
corpus scan fails CI instead of surviving until the next manual audit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e

    return e


def test_extract_merge_has_no_semantic_exchange(spark, entry):
    # the arrow engine's whole contract: zero shuffles end to end. The
    # single allowed exchange is the round-robin scan-parallelism
    # repartition of the one-file test corpus (purely physical) — any
    # HASH or RANGE exchange means the extraction itself shuffles.
    plan = _plan(entry.queries()["extract_merge"](spark, SF))
    semantic = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert not semantic, "\n".join(semantic)


def test_dsir_final_plan_scans_corpus_once(spark, entry):
    # the ratio table is collected and re-injected as a literal map —
    # the inline form re-derived the word counts and scanned 3×. Since
    # r6 the bucket-count kernel output is lineage-truncated, so the
    # final plan reads the checkpoint leaf: ≤ 1 scan (0 locally)
    plan = _plan(entry.queries()["dsir_select"](spark, SF))
    assert plan.count("FileScan parquet") <= 1, plan


def test_pq_encode_is_a_pure_map(spark, entry):
    from agentic_doc_spark.operators.similarity import (
        pq_encode,
        pq_train_codebook,
    )

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )
    cb = pq_train_codebook(emb, m=8, k=16)
    plan = _plan(pq_encode(emb, cb))
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_ann_pq_has_no_sort_merge_join(spark, entry):
    # the distance table is bounded and must broadcast
    plan = _plan(entry.queries()["ann_pq"](spark, SF))
    assert "SortMergeJoin" not in plan, plan


@pytest.mark.parametrize(
    "name", ["ann_bruteforce", "ann_ivf", "ann_pq", "ann_ivfpq"]
)
def test_ann_topk_has_no_single_partition_window(spark, entry, name):
    # per-query ranking must be the two-phase bounded top-k
    # (mapInArrow local top-k + bounded merge agg) — a
    # Window.partitionBy(query_id) funnels every candidate row of a
    # query through ONE reducer task (round-4 VERDICT finding #1)
    plan = _plan(entry.queries()[name](spark, SF))
    assert "Window" not in plan, (name, plan)


def test_semantic_dedup_assignment_materialized_once(spark):
    # the checkpoint cut: without it the zero-exchange assignment
    # subtree (scan + argmax fold) re-derives in all three consumers
    from agentic_doc_spark.operators.similarity import semantic_dedup

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )
    plan = _plan(semantic_dedup(emb, threshold=0.3))
    assert plan.count("FileScan parquet") <= 1, plan


def test_top_orders_uses_bounded_topk(spark, entry):
    # deterministic ranked top-10 must be TakeOrderedAndProject, never
    # a global sort
    plan = _plan(entry.queries()["top_orders"](spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_decontaminate_broadcasts_benchmark_side(spark, entry):
    plan = _plan(entry.queries()["decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
