"""Z-order (Morton) clustering: multi-column data skipping at write time.

Date partitioning prunes on time and bucketing co-locates ONE join key;
neither helps a scan that filters on two or more non-time columns at
once (``WHERE lat BETWEEN .. AND lon BETWEEN ..``, ``series IN (..) AND
host = ..``). Sorting the file by one column leaves every other
column's per-row-group min/max spanning the whole domain, so parquet
row-group skipping only works for the sort column. Interleaving the
bits of several columns into one Morton code and sorting by THAT keeps
every participating column locally clustered: each row group covers a
small hyper-rectangle of the key space, so its footer min/max stats are
narrow in EVERY dimension and a selective filter on ANY of them skips
most row groups. This is the layout step the reference cannot express
at all — its reads always merge every shard of a series
(client/m3dbseriesfamily.go:188-222); here the 100 TB scan cost is
decided by the footers before a single data page is read.

Mechanics (all JVM-side, whole-stage codegen — no UDFs):

- each column is scaled to an integer bucket in ``[0, 2^bits)`` with
  ``width_bucket`` over its observed min/max (one light agg job;
  pass explicit ``bounds`` to skip it or to clamp outliers). Linear
  scaling degrades under heavy skew — log/rank-transform such a column
  first, or tighten its bounds;
- bucket bits are interleaved dimension-major into one LONG
  (plan-time-generated shift/or expression tree, ``D*bits <= 63``);
- ``repartitionByRange`` on the code splits the keyspace into
  ``num_files`` contiguous z-ranges (sampled range boundaries — the
  same mechanism Spark uses for any range partitioning), and
  ``sortWithinPartitions`` orders rows inside each file so ROW-GROUP
  stats (not just file stats) stay tight.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_code", "zorder_write"]


def _column_bounds(
    df: DataFrame, cols: Sequence[str], bounds: Mapping[str, tuple[float, float]] | None
) -> dict[str, tuple[float, float]]:
    given = dict(bounds or {})
    missing = [c for c in cols if c not in given]
    if missing:
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in missing],
            *[F.max(c).alias(f"hi_{c}") for c in missing],
        ).first()
        for c in missing:
            lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
            if lo is None:  # all-NULL column: any constant works
                lo, hi = 0.0, 1.0
            given[c] = (float(lo), float(hi))
    return given


def zorder_code(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    bounds: Mapping[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton code over ``cols`` as a LONG column (codegen expression).

    ``bits`` per dimension; ``len(cols) * bits`` must fit in 63 bits.
    Numeric and timestamp/date columns work (anything castable to
    double). NULLs bucket to 0 — they cluster together at the low end.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_code needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a LONG")
    b = _column_bounds(df, cols, bounds)
    ndim = len(cols)
    buckets = []
    for c in cols:
        lo, hi = b[c]
        if hi <= lo:  # constant column: single bucket
            buckets.append(F.lit(0).cast("long"))
            continue
        # width_bucket is 1-based and returns numBuckets+1 above the top
        # bound; clamp into [0, 2^bits) so explicit bounds act as limits.
        w = F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(1 << bits))
        # coalesce BEFORE the clamp: least/greatest skip NULL operands, so a
        # NULL value would otherwise clamp to the top bucket, not bucket 0.
        w0 = F.coalesce(w - 1, F.lit(0))
        buckets.append(
            F.greatest(F.least(w0, F.lit((1 << bits) - 1)), F.lit(0)).cast("long")
        )
    # Interleave dimension-major: output bit (i*ndim + d) = bit i of dim d.
    code = F.lit(0).cast("long")
    for i in range(bits):
        for d in range(ndim):
            bit = F.shiftright(buckets[d], i).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(F.shiftleft(bit, i * ndim + d))
    return code


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 16,
    bits: int = 8,
    bounds: Mapping[str, tuple[float, float]] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    The z-code is a layout key only — it is dropped before writing, and
    dropping a projection after the sort does not disturb row order.
    """
    z = zorder_code(df, cols, bits=bits, bounds=bounds)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
