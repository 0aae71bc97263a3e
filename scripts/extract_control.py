"""Per-round extract-only throughput control (round-4 VERDICT task 3).

The driver's `docs_per_sec_extract` declined four consecutive rounds
(6544 → 5807 → 5308 → 4188) with no committed local number to separate
box load from code regressions. This script measures the SAME query the
driver times (`__spark_entry__.queries()["extract_merge"]` at sf0.1,
local[32], noop sink) under a fixed protocol — ONE fresh child process,
warm-up force, then min-of-5 — alongside a pure-compute control job
(range → sqrt → sum, no Python, no shuffle) that bounds what the box
allows at measurement time. History persists in
BENCH/extract_control.json and renders as the "Per-round extract-only
control" section of BENCH/BASELINE.md, so a cross-round decline can be
attributed: extract down AND control flat ⇒ code regression (bisect);
both down ⇒ external tenant load.

Run:  python scripts/extract_control.py [round_label] [sf_dir]
      (round label defaults to r{max BENCH_r*.json + 1})
"""

from __future__ import annotations

import datetime as _dt
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from agentic_doc_spark.config import build_spark

spark = build_spark(master="local[32]", shuffle_partitions=32,
                    extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry
from pyspark.sql import functions as F

sf_dir = {sf_dir!r}
q = entry.queries()["extract_merge"]

def force(df):
    df.write.mode("overwrite").format("noop").save()

force(q(spark, sf_dir).limit(50))  # JIT/codegen warm-up (bench.py protocol)
n_docs = spark.read.parquet(f"{{sf_dir}}/documents.parquet").count()
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    force(q(spark, sf_dir))
    ts.append(time.perf_counter() - t0)
# pure-compute box-load control (the scaling_bench control job)
cdf = spark.range(2_000_000_000, numPartitions=128)
cdf.select(F.sum(F.sqrt(F.col("id")))).collect()
cts = []
for _ in range(3):
    t0 = time.perf_counter()
    cdf.select(F.sum(F.sqrt(F.col("id")))).collect()
    cts.append(time.perf_counter() - t0)
print("RESULT " + json.dumps({{
    "n_docs": n_docs,
    "extract_sec": round(min(ts), 3),
    "extract_spread": round(max(ts) - min(ts), 3),
    "docs_per_sec": round(n_docs / min(ts), 1),
    "control_sec": round(min(cts), 3),
}}))
"""


def _infer_round() -> str:
    rounds = [
        int(m.group(1))
        for p in REPO.glob("BENCH_r*.json")
        if (m := re.match(r"BENCH_r(\d+)\.json$", p.name))
    ]
    return f"r{(max(rounds) + 1 if rounds else 1):02d}"


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else _infer_round()
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    src = _CHILD.format(repo=str(REPO), sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", src], capture_output=True, text=True
    )
    line = next(
        (ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")),
        None,
    )
    if line is None:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
        raise SystemExit("extract control child produced no RESULT line")
    rec = json.loads(line[len("RESULT "):])
    rec["round"] = label
    rec["date"] = _dt.date.today().isoformat()

    hist_path = REPO / "BENCH" / "extract_control.json"
    hist = (
        json.loads(hist_path.read_text()) if hist_path.exists() else []
    )
    hist = [h for h in hist if h.get("round") != label] + [rec]
    hist_path.write_text(json.dumps(hist, indent=1) + "\n")

    rows = "\n".join(
        f"| {h['round']} | {h['date']} | {h['extract_sec']} s "
        f"(spread {h['extract_spread']}) | {h['docs_per_sec']:,} | "
        f"{h['control_sec']} s |"
        for h in hist
    )
    body = f"""## Per-round extract-only control

The driver's `docs_per_sec_extract` is measured inside a warm shared
session under whatever box load the round happens to see. This table is
the committed local control for the SAME query (`extract_merge`, sf0.1,
local[32], noop sink): one fresh process per round, warm-up force, then
min-of-5; the control column is the pure-compute job (range→sqrt→sum,
no Python, no shuffle) that bounds what the box allowed at measurement
time. Attribution rule: extract slower while control is flat ⇒ code
regression (bisect and name the commit); both slower ⇒ external tenant
load. History lives in BENCH/extract_control.json; regenerate with
`python scripts/extract_control.py`.

| round | date | extract min-of-5 | docs/s | compute control |
|---|---|---|---|---|
{rows}
"""
    sys.path.insert(0, str(REPO / "scripts"))
    from _md_sections import replace_section

    replace_section(
        REPO / "BENCH" / "BASELINE.md",
        "Per-round extract-only control",
        body,
    )
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
