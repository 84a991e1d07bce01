"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism before CPU-heavy
    per-row work. A small input (one parquet file -> one partition)
    would otherwise pin the whole computation to a single core; at real
    scale the scan already has >= defaultParallelism partitions and
    this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
