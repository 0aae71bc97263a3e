"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "docs_per_sec_extract": ..., "n_docs": ...}

Execution is forced with the noop sink (full computation, no driver
collect). The flagship extract pipeline is additionally reported as
documents/sec — the BASELINE.json throughput metric. Scaling-efficiency
evidence (local[8] vs local[32]) is produced by scripts/scaling_bench.py
and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from agentic_doc_spark.config import build_spark

    import __spark_entry__ as entry

    spark = build_spark(
        app_name="agentic-doc-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "extract_merge",
        "errdoc_errors",
        "boilerplate_strip",
        "token_counts",
        "quality_langid",
        "fingerprint",
        "dedup_exact",
        "minhash_bands",
        "simhash",
        "lsh_jaccard_pairs",
        "ann_bruteforce",
        "ann_ivf",
        "events_sessions",
        # the flagship LLM-pipeline composition + its two newest stages
        # (round-3 VERDICT task 7: visible round-over-round)
        "decontaminate",
        "pack_bins",
        "training_set",
        "dup_substring_spans",
        # round-4 late additions: interleaved multimodal packing, DSIR
        # selection, semantic dedup, distributed BPE
        "pack_interleaved",
        "dsir_select",
        "domain_mix",
        "semantic_dedup",
        "bpe_tokens",
        "ann_pq",
        # round-5 additions: combined IVF-PQ ANN, stateful-kernel replay
        "ann_ivfpq",
        "sessionize_batch",
    ]
    qs = entry.queries()

    # warm the JVM/Arrow path once so per-query times measure the plans
    _force(qs["extract_merge"](spark, sf_dir).limit(50))

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    times: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in headline:
        runs = []
        for _ in range(3):  # min-of-3: exclude plan-compile/JIT warm-up
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        times[name] = round(min(runs), 3)
        # max-min across the 3 runs: lets a reader separate box-load
        # noise (wide spread) from a real plan regression (tight spread,
        # higher min) without a re-run
        spread[name] = round(max(runs) - min(runs), 3)

    total = round(sum(times.values()), 3)
    dps = round(n_docs / max(times["extract_merge"], 1e-9), 1)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (docs/sec for extract in docs_per_sec_extract)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_spread": spread,
                "sf": sf,
                "docs_per_sec_extract": dps,
                "n_docs": n_docs,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
