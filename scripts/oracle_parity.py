"""Oracle parity sweep at an arbitrary sf dir (the driver runs sf0.01;
tests run sf0.001). Value-level, order-insensitive — same canonicalization
as tests/test_entry_oracle.py.

Run: python scripts/oracle_parity.py <sf_dir> [<query> ...]
(no query names = all oracle-bearing queries)
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _canon(val):
    if val is None:
        return "␀"
    if isinstance(val, bool):
        return "T" if val else "F"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.9g}"
    return str(val)


def _canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import duckdb

    from agentic_doc_spark.config import build_spark

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = build_spark(
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    oracle = entry.oracle_sql()
    qs = entry.queries()
    if not names:
        names = [n for n in sorted(qs) if n in oracle]
    n_fail = 0
    for name in names:
        if name not in oracle:
            print(f"{name}: NO ORACLE (skipped)")
            continue
        sdf = qs[name](spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        res = con.execute(oracle[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_n = len(srows) == len(drows)
        a = _canon_rows(scols, [[r[c] for c in scols] for r in srows])
        b = _canon_rows(dcols, drows)
        ok_vals = a == b
        status = "OK" if (ok_cols and ok_n and ok_vals) else "FAIL"
        if status == "FAIL":
            n_fail += 1
            mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:2]
            print(
                f"{name}: FAIL cols={ok_cols} rows={len(srows)}/{len(drows)}"
                + "".join(f" | {a[i]} != {b[i]}" for i in mism)
            )
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
