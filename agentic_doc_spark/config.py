"""Engine settings + SparkSession factory.

Mirrors the reference Settings (agentic_doc/config.py:85-148): split_size=10
(≤100), extraction_split_size=50, batch/worker knobs become Spark parallelism
config. Designed for a 1000-executor cluster; local[] for tests.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class Settings:
    """Pipeline knobs, same defaults/bounds as the reference.

    - split_size: pages per part (reference agentic_doc/config.py:123-128,
      asserted 0 < split_size <= 100 in agentic_doc/utils.py:229-231).
    - extraction_split_size: max pages when field extraction is enabled
      (agentic_doc/config.py:129-134, guard agentic_doc/parse.py:483-498).
    - spans_per_page: fixture constant deriving page_no = offset //
      spans_per_page (FIXTURES.md §1).
    - include_marginalia / include_metadata_in_markdown: the two analysis
      flags (agentic_doc/parse.py:60-61).
    - strip_boilerplate: north-rule HTML boilerplate strip (no reference
      analog).

    Mega-document skew needs no salt knob: the (doc_id, part_idx) shuffle
    key IS the content-derived salt (pipeline.py stage 3), so there is no
    salt-width parameter to tune.
    """

    split_size: int = 10
    extraction_split_size: int = 50
    spans_per_page: int = 4
    include_marginalia: bool = True
    include_metadata_in_markdown: bool = True
    strip_boilerplate: bool = True
    use_pandas_udf: bool = True  # False = pure-JVM expression kernel
    #: "arrow"  = zero-shuffle mapInArrow engine (default — fastest, the
    #:            vectorized-Arrow-UDF execution the north rule mandates);
    #: "shuffle" = the two-level split/merge DataFrame pipeline mirroring
    #:            the reference's part fan-out (kept for plan-shape parity
    #:            and as the cross-check engine).
    engine: str = "arrow"

    def __post_init__(self) -> None:
        if not (0 < self.split_size <= 100):
            raise ValueError("split_size must be in (0, 100]")
        if not (0 < self.extraction_split_size <= 50):
            raise ValueError("extraction_split_size must be in (0, 50]")
        if self.spans_per_page <= 0:
            raise ValueError("spans_per_page must be positive")


DEFAULT_SETTINGS = Settings()


def build_spark(
    app_name: str = "agentic-doc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """SparkSession tuned for the extraction workload.

    Scale-aware defaults: AQE on (runtime coalescing + skew splitting),
    Arrow on (pandas UDF batches), shuffle partitions sized to cores
    locally (a real cluster overrides via spark-submit conf).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if master.startswith("local["):
        try:
            local_threads = int(master[len("local[") : -1].replace("*", "0")) or cpus
        except ValueError:
            local_threads = cpus
    else:
        local_threads = cpus
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
    )
    # Arrow batch size scales INVERSELY with parallelism so the aggregate
    # Python-worker working set stays constant: measured on this box
    # (BENCH/BASELINE.md §attribution sweep), 10k-record batches at 32
    # workers saturate shared memory (8→32 efficiency 0.217, NEGATIVE
    # absolute scaling) while 2k batches reach 0.74 — the pure-JVM control
    # ceiling. At low parallelism bigger batches amortize IPC better.
    arrow_batch = max(1024, 65536 // max(local_threads, 1))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # reliable-checkpoint files (iterative ops, dedup._truncate_lineage)
        # are garbage-collected with their DataFrames on long-lived drivers
        # instead of accumulating forever (default is false)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    # Shuffle files on tmpfs in LOCAL mode: this box's disk-backed /tmp
    # is the shared bottleneck for every shuffle (measured: a 320k-row
    # round-robin repartition at local[32] took 1.52 s via /tmp vs
    # 0.55 s via /dev/shm — shuffle-heavy operators anti-scaled with
    # thread count). A real cluster configures per-node spark.local.dir
    # (NVMe) in spark-submit conf, which overrides this local default.
    shm = "/dev/shm"
    if (
        master.startswith("local")
        and "spark.local.dir" not in (extra_conf or {})
        and os.access(shm, os.W_OK)
    ):
        d = os.path.join(shm, "spark-local")
        try:
            os.makedirs(d, exist_ok=True)
            b = b.config("spark.local.dir", d)
        except OSError:
            pass
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to Python workers (the local-mode equivalent of
    ``spark-submit --py-files``). Without it, the pandas-UDF kernel fails
    with ModuleNotFoundError whenever the driver's cwd isn't the repo
    root — workers unpickle kernel closures by module reference."""
    import tempfile
    import zipfile
    from pathlib import Path

    pkg_dir = Path(__file__).resolve().parent
    zip_path = Path(tempfile.gettempdir()) / "agentic_doc_spark_pyfiles.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for f in sorted(pkg_dir.rglob("*.py")):
            zf.write(f, f"agentic_doc_spark/{f.relative_to(pkg_dir)}")
    spark.sparkContext.addPyFile(str(zip_path))
