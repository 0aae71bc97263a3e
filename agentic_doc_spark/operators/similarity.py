"""Approximate-nearest-neighbor search over embedding columns.

- brute_force_topk: exact cosine top-k — the correctness baseline. The
  query side is broadcast (queries ≪ corpus), the corpus side streams:
  one wide scan, no shuffle until the per-query top-k aggregation.
- ivf_topk: the scale path — k-means-lite IVF. Centroids are derived
  deterministically (hash-sampled corpus vectors), every vector is
  assigned to its nearest centroid (one narrow pass), and queries probe
  only the nearest n_probe cells: the candidate set shrinks by
  ~n_cells/n_probe. At 10^10 vectors this is the difference between a
  full scan per query and a bucketed equi-join.

All vector math is JVM higher-order functions (zip_with/aggregate) — no
Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from agentic_doc_spark.operators.dedup import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query (query_id, neighbor_id, cos, rank).

    Self-matches excluded. Queries are broadcast — scoring is a map-side
    nested loop over corpus partitions, then one shuffle for the window
    top-k."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(q).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def derive_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic IVF centroids: the vector with the smallest id in
    each of n_cells id-modulo buckets (cheap k-means++ stand-in; a real
    trainer can replace this without changing the plan shape — and the
    modulo form is reproducible in any engine, which the DuckDB oracle
    uses)."""
    bucketed = corpus.select(
        (F.col(id_col) % n_cells).alias("cell"),
        F.col(id_col),
        F.col(vec_col),
    )
    w = Window.partitionBy("cell").orderBy(id_col)
    return (
        bucketed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cell", F.col(vec_col).alias("centroid"))
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid (centroids broadcast)."""
    c = F.broadcast(centroids)
    scored = corpus.crossJoin(c).select(
        F.col(id_col),
        F.col(vec_col),
        "cell",
        cosine(F.col(vec_col), F.col("centroid")).alias("ccos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cell")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: probe the n_probe nearest cells per query, exact cosine
    within them. Approximate (recall < 1 when true neighbors live in
    unprobed cells) but plan-identical at any scale."""
    cents = derive_centroids(corpus, n_cells, vec_col, id_col)
    assigned = assign_cells(corpus, cents, vec_col, id_col)

    qc = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "cell", cosine(F.col("qv"), F.col("centroid")).alias("ccos")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cell"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    cand = probes.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell"
        ),
        "cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
