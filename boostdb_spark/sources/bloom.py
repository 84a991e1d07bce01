"""Parquet bloom-filter layout: point-lookup data skipping for
high-cardinality, non-clustered columns.

Row-group min/max statistics (the z-order/sort machinery,
sources/zorder.py) only skip when the column is CLUSTERED — a
high-cardinality id scattered uniformly across the table has
full-domain min/max in every row group, so an equality probe still
reads everything. Parquet bloom filters close exactly that gap: the
writer stores a split-block bloom filter per (row group, column), and
an equality / IN probe skips any row group whose filter proves the
value absent — no clustering, no re-sort, a few KB per row group. This
is the third leg of the data-skipping family next to z-ordering
(range predicates over few clustered dims) and bucketing (join
co-location): at 100 TB, a needle-in-haystack id lookup touches only
the row groups whose bloom filter fires, independent of layout.

All engine-side: the standard parquet-mr writer options
(``parquet.bloom.filter.enabled#col``) flow through Spark's
DataFrameWriter, and Spark's parquet scan consults the filters during
row-group pruning (parquet.filter.bloom.enabled, default on). False
positives only cost a read — results are exact either way, which is
why the certified entry hashes the full filter semantics against the
oracle over the raw table.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["bloom_write", "read_bloom"]


def bloom_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    expected_ndv: Mapping[str, int] | int = 100_000,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet with a bloom filter on each column in
    ``cols``. ``expected_ndv`` sizes the filter (per column or one
    value for all): overshooting wastes a few KB per row group,
    undershooting raises the false-positive rate — at scale derive it
    from ``approx_count_distinct`` per write batch."""
    w = df.repartition(num_files).write.mode(mode)
    for c in cols:
        ndv = (
            expected_ndv.get(c, 100_000)
            if isinstance(expected_ndv, Mapping)
            else int(expected_ndv)
        )
        w = (
            w.option(f"parquet.bloom.filter.enabled#{c}", "true")
            .option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
        )
    w.parquet(path)


def read_bloom(spark: SparkSession, path: str) -> DataFrame:
    """Read a bloom-written table. Bloom-based row-group pruning is on
    by default (``parquet.filter.bloom.enabled``); this is a plain
    scan so every pushed equality/IN predicate gets the skipping for
    free."""
    return spark.read.parquet(path)
