"""Bucketed-layout co-located joins: the zero-exchange join evidence."""

from __future__ import annotations

from pyspark.sql import functions as F

from agentic_doc_spark.sources.bucketing import colocated_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark):
    # warehouse dir is a tmp path (conftest) — saveAsTable writes there
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("x")
    )
    meta = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("y")
    )
    write_bucketed(docs, "b_docs", n_buckets=8)
    write_bucketed(meta, "b_meta", n_buckets=8)
    # at 500 rows the planner rightly prefers broadcast; disable it to
    # observe the layout that matters at fact⋈fact scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "b_docs", "b_meta")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert "SortMergeJoin" in plan
        # and it is CORRECT, not just shuffle-free
        assert j.count() == 500
        row = j.filter(F.col("doc_id") == 3).collect()[0]
        assert (row["x"], row["y"]) == (3, 6)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_meta")
