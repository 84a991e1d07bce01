"""Deterministic sampling and dataset splitting for training-data
pipelines. North-star extension beyond the reference.

``df.sample()`` draws from a per-partition RNG — results change with
partitioning, retries, and cluster size, which is unacceptable for
reproducible training sets. These operators key every decision off a
content hash (md5-derived 32-bit int, operators/text.py:hash32): the
same row lands in the same split on any cluster, any partitioning, any
engine — and the DuckDB oracle reproduces the exact row set.

Scale shape: a hash + modulo filter/projection — pure codegen, pushed
into the scan pipeline, zero shuffle, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from boostdb_spark.operators.text import hash32


def _bucket(key: Column, buckets: int = 10_000) -> Column:
    return F.pmod(hash32(key.cast("string")), F.lit(buckets))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = 10_000
) -> DataFrame:
    """Keep rows whose key hashes into the first ``fraction`` of
    ``buckets`` hash buckets — a stable ~fraction sample: reproducible
    across runs/partitionings, and monotone (a 20% sample contains the
    10% sample, so growing a training set never resamples)."""
    return df.filter(_bucket(F.col(key_col), buckets) < int(fraction * buckets))


def train_val_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    buckets: int = 10_000,
    out_col: str = "split",
) -> DataFrame:
    """Label every row 'val' or 'train' by hash bucket — the standard
    leakage-safe split: keyed on content/id, so duplicates of a
    document always land on the same side, regardless of order or
    partitioning."""
    is_val = _bucket(F.col(key_col), buckets) < int(val_fraction * buckets)
    return df.withColumn(out_col, F.when(is_val, "val").otherwise("train"))
