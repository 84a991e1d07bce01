"""Bucketed (co-located) tables: pre-shuffle once at write time, join
shuffle-free forever after.

The reference distributes writes over ``distributionFactor`` physical
shards per logical series (client/m3dbseriesfamily.go:156-168) purely
for write parallelism — reads merge all shards back. Bucketing is the
Spark-native generalization that actually pays off at read time: rows
are hash-partitioned into N buckets ON A KEY at write time, and every
subsequent equi-join or aggregation on that key reads the co-located
buckets with NO Exchange in the plan. At 100 TB this turns the
fact-to-fact join — normally the single biggest shuffle in the
pipeline — into a zipped per-bucket merge join.

Rules of thumb encoded here:

- bucket count should be sized so one bucket of the LARGEST table fits
  an executor's working memory (~hundreds of MB of parquet per bucket);
  both join sides must use the SAME count for exchange-free joins.
- ``sortBy`` the bucket key (plus time) so the join is a pure merge —
  no per-bucket hash table — and row-group stats stay selective.
- bucketing metadata lives in the session catalog (``saveAsTable``);
  plain ``.parquet(path)`` writes cannot carry it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed parquet table registered in the
    session catalog. ``sort_cols`` defaults to the bucket key.

    Idempotent across sessions: drops a previous catalog entry AND any
    orphaned managed-table directory (a fresh session's catalog doesn't
    know about last session's location, and saveAsTable refuses to
    reuse it — LOCATION_ALREADY_EXISTS)."""
    if sort_cols is None:
        sort_cols = list(bucket_cols)
    spark = df.sparkSession
    parts = [p.strip("`") for p in table.split(".")]
    quoted = ".".join(f"`{p}`" for p in parts)
    existed = spark.catalog.tableExists(table)
    spark.sql(f"DROP TABLE IF EXISTS {quoted}")
    if path is None:
        import os
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if wh.scheme in ("", "file"):
            # Managed location: <wh>/<tbl> for the default db,
            # <wh>/<db>.db/<tbl> for a qualified name. Only delete what
            # the catalog drop just orphaned OR a leftover directory
            # from a previous session's managed table at that exact
            # computed location (LOCATION_ALREADY_EXISTS otherwise).
            if len(parts) == 1:
                loc = os.path.join(wh.path, parts[0].lower())
            else:
                loc = os.path.join(
                    wh.path, f"{parts[-2].lower()}.db", parts[-1].lower()
                )
            if existed or os.path.isdir(loc):
                shutil.rmtree(loc, ignore_errors=True)
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*sort_cols)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``on`` with the same bucket count.

    The plan this produces (and tests/test_bucketing.py asserts) is a
    SortMergeJoin with ZERO shuffle exchanges — each task zips bucket i
    of both sides. The join disables broadcast promotion so the
    exchange-free property is visible and stable even for small test
    tables; at real scale the optimizer would keep the merge join
    anyway (both sides huge).
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right.hint("merge"), list(on), how)
