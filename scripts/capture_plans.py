"""Capture `.explain("formatted")` output for named queries into
plans/<tag>/<query>_<suffix>.txt (the r06 optimization-evidence files).

Run: python scripts/capture_plans.py <tag> <suffix> <query> [<query> ...]
e.g. python scripts/capture_plans.py r06 before lsh_jaccard_pairs ann_pq
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from agentic_doc_spark.config import build_spark

    import __spark_entry__ as entry

    spark = build_spark(
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote plans/{tag}/{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
