"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Round-robin repartition ONLY when the scan produced fewer partitions
    than the cluster has cores — the small-file artifact where one 2 MB
    parquet file becomes one task and serializes a CPU-bound operator.

    At real scale (file count x row groups >> cores) this is a no-op, so
    the big-data path never pays an extra shuffle.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
