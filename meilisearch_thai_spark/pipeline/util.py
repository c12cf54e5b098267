"""Shared pipeline-operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Raise scan parallelism to the cluster's when the input arrives in
    fewer partitions (a small parquet file plans as ONE split, serializing
    expensive per-row expressions — shingling, dot products — onto a single
    core; measured 6x on the sf0.1 dedup bench).  At corpus scale the input
    already has >= cluster partitions and this is a no-op — no shuffle is
    ever added there."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
