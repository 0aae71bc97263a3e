"""Data selection for LLM pre-training corpora.

``dsir_weights`` implements DSIR-style importance resampling (Xie et
al. 2023, "Data Selection for Language Models via Importance
Resampling" — public method): documents are scored by how much more
likely their hashed-unigram bag is under a small TARGET corpus than
under the raw pool, and the top-weighted documents are selected.

Engine-portable by construction (value-matching DuckDB twin):

- the feature hash is the repo's canonical md5 fold
  (``conv(substr(md5(word),1,15),16,10) % n_buckets`` — matches
  DuckDB ``('0x'||substr(md5(w),1,15))::BIGINT % n_buckets``);
- per-bucket log-likelihood ratios are rounded to 6 dp BEFORE the
  per-document weighted sum, so a 1-ulp ln() difference between the
  JVM and another engine's libm dies at the rounding;
- the per-document sum folds terms in ascending bucket order
  (collect → sort → sequential ``F.aggregate``), making float
  summation order canonical across engines and partition layouts.

Scale shape: one shuffle for (doc, bucket) counts, one bounded
aggregation to the ``n_buckets``-row ratio table (broadcast back), one
groupBy(doc) for the fold — no window over a global order; selection
is a bounded top-k (TakeOrderedAndProject), not a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, n_buckets: int):
    """Canonical engine-portable hash bucket of a word."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % n_buckets
    )


def dsir_weights(
    docs: DataFrame,
    target_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 128,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance weight.

    ``target_col`` is a boolean column marking the target (quality)
    subset; the raw distribution is the whole input. Weight =
    Σ_words round(ln(p_target(bucket)) − ln(p_raw(bucket)), 6) with
    add-``alpha`` smoothing, summed in canonical bucket order and
    rounded to 6 dp. Positive weight ⇒ more target-like than the pool.
    """
    words = docs.select(
        F.col(id_col),
        F.col(target_col).alias("_is_t"),
        F.explode(F.split(F.col(text_col), " ")).alias("_w"),
    )
    per = words.groupBy(
        id_col, "_is_t", _bucket(F.col("_w"), n_buckets).alias("bucket")
    ).agg(F.count("*").alias("c"))
    stats = per.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_t"), F.col("c")).otherwise(0)).alias("t_b"),
        F.sum("c").alias("r_b"),
    )
    tot = stats.agg(
        F.sum("t_b").alias("t_tot"), F.sum("r_b").alias("r_tot")
    )
    a, b = float(alpha), float(alpha * n_buckets)
    lam = stats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log((F.col("t_b") + a) / (F.col("t_tot") + b))
            - F.log((F.col("r_b") + a) / (F.col("r_tot") + b)),
            6,
        ).alias("lam"),
    )
    terms = per.join(F.broadcast(lam), "bucket").select(
        id_col, "bucket", (F.col("c") * F.col("lam")).alias("term")
    )
    ordered = F.array_sort(F.collect_list(F.struct("bucket", "term")))
    return terms.groupBy(id_col).agg(
        F.round(
            F.aggregate(
                F.transform(ordered, lambda s: s["term"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("weight")
    )


def dsir_select(
    docs: DataFrame,
    target_col: str,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 128,
    alpha: float = 1.0,
) -> DataFrame:
    """Top-``k`` documents by DSIR weight (ties broken by id — fully
    deterministic). ``k`` is bounded, so the plan is
    TakeOrderedAndProject, not a global sort."""
    w = dsir_weights(docs, target_col, text_col, id_col, n_buckets, alpha)
    return w.orderBy(F.desc("weight"), F.asc(id_col)).limit(k)
