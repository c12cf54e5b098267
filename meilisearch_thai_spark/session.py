"""SparkSession factory with scale-oriented defaults.

Local-mode testing stands in for a multi-executor cluster; every config here
is chosen to be the right one at 1000-executor / 100 TB scale too:
AQE on (runtime coalescing + skew-join splitting), Arrow transfer for all
pandas UDFs, explicit shuffle partitioning sized by caller.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

_PKG_ROOT = str(Path(__file__).resolve().parents[1])


def build_spark(
    app_name: str = "meilisearch-thai-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 32)
    # Make this package importable inside executor Python workers regardless
    # of the driver's cwd (cluster equivalent: spark-submit --py-files).
    prev = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in prev.split(":"):
        os.environ["PYTHONPATH"] = f"{_PKG_ROOT}:{prev}" if prev else _PKG_ROOT
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # always compile IN-lists to InSet (a referenced set object) instead
        # of inlined constants: point-query plans then generate IDENTICAL
        # Java source across queries, so Janino's codegen cache hits and the
        # per-query compile cost disappears from serving latency
        .config("spark.sql.optimizer.inSetConversionThreshold", "0")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
