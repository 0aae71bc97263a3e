"""Thin table catalog: Iceberg-shaped API over parquet (SURVEY.md §7.3).

The north rule stores corpora and lineage in Iceberg tables; this sandbox
has no Iceberg runtime jar, so the engine talks to tables through this
shim. On a real cluster, swap ``fmt="iceberg"`` (every call is already
`.format(fmt)`-shaped) and ``snapshot_id`` becomes the table's native
snapshot; here it is derived deterministically from the committed file
set, which is exactly what the lineage rows need for exact resume.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """Minimal table API: read / append / snapshot_id / exists."""

    def __init__(self, root: str, fmt: str = "parquet") -> None:
        self.root = root.rstrip("/")
        self.fmt = fmt

    def path(self, table: str) -> str:
        return f"{self.root}/{table}"

    def exists(self, table: str) -> bool:
        p = Path(self.path(table))
        return p.exists() and any(p.glob(f"*.{self.fmt}"))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.format(self.fmt).load(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").format(self.fmt).save(self.path(table))

    def overwrite(self, df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").format(self.fmt).save(self.path(table))

    def snapshot_id(self, table: str) -> str:
        """Deterministic snapshot id: sha256 over the sorted (name, size)
        of the table's data files — changes iff the data changes, the
        property lineage resume relies on. Iceberg's native snapshot id
        replaces this verbatim on a real catalog."""
        p = Path(self.path(table))
        if not p.exists():
            return "empty"
        entries = sorted(
            (f.name, f.stat().st_size)
            for f in p.rglob("*")
            if f.is_file() and not f.name.startswith(("_", "."))
        )
        h = hashlib.sha256()
        for name, size in entries:
            h.update(f"{name}:{size};".encode())
        return h.hexdigest()[:16]
