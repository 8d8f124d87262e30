"""SparkSession factory with scale-oriented defaults.

Defaults target the sandbox (``local[$SPARK_GRAFT_CPUS]``) but every knob is
what we would set on a real multi-executor cluster: AQE on (runtime shuffle
coalescing + skew-join splitting), Arrow enabled for the pandas-UDF analyzer
path, and shuffle partitions sized to the parallelism level.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def scan_waves(spark: SparkSession, factor: int = 2):
    """Temporarily require >= ``factor x shuffle_partitions`` input-scan
    partitions (>= 2 scan waves per core). Build pipelines want this — with
    exactly one scan partition per core the slowest analyze task gates the
    whole stage (no straggler amortization), which measurably hurts 4N-core
    scaling efficiency. Query-time scans must NOT inherit it: forcing a
    tiny term-filtered read into 2x-cores tasks just inflates task-launch
    overhead (the round-2 bench regression on sub-second queries). Hence a
    scoped conf around builds instead of a session-wide default."""
    key = "spark.sql.files.minPartitionNum"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    n = factor * int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _ship_package(spark: SparkSession) -> None:
    """Make searchengine_spark importable on executors (the spark-submit
    ``--py-files`` contract, done automatically for library users)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(tempfile.gettempdir(), "searchengine_spark_pyfiles")
    zip_path = shutil.make_archive(base, "zip", os.path.dirname(pkg_dir),
                                   os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(zip_path)


def get_spark(
    app_name: str = "searchengine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~1x cores; on a cluster this scales with executor count
        n = master[master.index("[") + 1 : -1] if master.startswith("local[") else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # NB: spark.sql.files.minPartitionNum (>=2 scan waves) is applied
        # per-BUILD via the scan_waves() context manager, not session-wide:
        # builds want straggler amortization, while tiny query-time scans
        # regress ~25-60% when force-split into 2x-cores tasks
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark
