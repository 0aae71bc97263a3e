"""Per-query noop-sink isolation bench (guide §1.4) — NOT the driver
contract file (bench.py is frozen); cite these numbers in
OPTIMIZATION_r06.md.

Run: SPARK_GRAFT_SF_DIR=... python bench_extra.py <query> [<query> ...]
Prints one JSON line: {"queries": {name: min_sec}, "spread": {...},
"sf": ..., "cpus": ...}. Same methodology as bench.py (min-of-3,
noop sink, warm session).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    names = sys.argv[1:]

    from agentic_doc_spark.config import build_spark

    import __spark_entry__ as entry

    spark = build_spark(
        app_name="agentic-doc-spark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def _force(df):
        df.write.mode("overwrite").format("noop").save()

    _force(qs["extract_merge"](spark, sf_dir).limit(50))  # JVM/Arrow warm-up

    times, spread = {}, {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        times[name] = round(min(runs), 3)
        spread[name] = round(max(runs) - min(runs), 3)
    print(
        json.dumps(
            {
                "queries": times,
                "spread": spread,
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
