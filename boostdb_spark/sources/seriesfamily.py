"""Series-family storage layer: time-partitioned Parquet tables.

Reference semantics being re-expressed (not ported):

- ``SeriesFamily.WriteTagged`` (client/m3dbseriesfamily.go:147-185) writes
  one datapoint ``(series, ts, value)`` with series-level *tags* and
  per-datapoint *attributes*, round-robined over ``distributionFactor``
  physical shards (m3dbseriesfamily.go:156-168). Here: a DataFrame append
  to a date-partitioned Parquet table. Spark's file-level parallelism
  replaces explicit shards; Parquet dictionary pages replace the symbol
  table (core/symtable.go:28-55).
- ``SeriesFamily.Fetch`` (m3dbseriesfamily.go:188-222) fans out one fetch
  per shard and k-way-merges iterators by timestamp
  (client/boostseriesiterator.go:270-343). Here: a partition-pruned read
  plus ``ORDER BY ts`` — the merge iterator is the SortExec.

Scale posture: the table is partitioned by ``date(ts)`` so every query
with a time predicate prunes partitions at 100 TB; within a partition,
files are written sorted by ``(series, ts)`` so min/max row-group stats
make series predicates skippable too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: canonical column names (FIXTURES.md section 1)
TS = "ts"
SERIES = "series"
VALUE = "value"
DATE_COL = "ts_date"


class SeriesFamily:
    """A table-like collection of series (core/seriesfamily.go:8-11).

    ``domain.family`` is the qualified FROM name
    (query/base/queryops.go:44-58); here it maps to a storage path and a
    registered view name ``domain__family``.
    """

    def __init__(self, spark: SparkSession, domain: str, family: str, root: str):
        self.spark = spark
        self.domain = domain
        self.family = family
        self.path = f"{root.rstrip('/')}/{domain}/{family}"

    @property
    def qualified_name(self) -> str:
        return f"{self.domain}.{self.family}"

    @property
    def view_name(self) -> str:
        return f"{self.domain}__{self.family}"

    # ------------------------------------------------------------------ write
    def write(self, df: DataFrame, mode: str = "append", files_per_day: int = 8) -> None:
        """Append datapoints. Expects at least (series, ts, value) plus any
        tag/attribute columns; schema evolution is allowed (the reference
        creates attributes on first write, core/symtable.go:288-321 — here
        ``mergeSchema`` on read handles it).

        ``ts`` may be TimestampType or INT64 ns (ns-native reference,
        core/seriesfamily.go:23). A ``ts_date`` partition column is derived
        for pruning; data within each output file is sorted by
        (series, ts) for row-group skipping at scale.

        Shuffle key is (date, series-hash % files_per_day), NOT date
        alone: a typical ingest batch is one day, and hashing on date
        alone funnels the whole batch through ONE reducer. The series
        bucket spreads a day over ``files_per_day`` writers while
        keeping each series clustered in one file per day (the write
        round-robin distribution of m3dbseriesfamily.go:156-168, minus
        the read-side merge cost).
        """
        ts_as_time = self._ts_expr(df)
        out = df.withColumn(DATE_COL, F.to_date(ts_as_time))
        bucket = F.pmod(F.hash(F.col(SERIES)), F.lit(files_per_day))
        # sortWithinPartitions (not orderBy): no global shuffle on ingest,
        # just per-file clustering for stats-based skipping.
        out = out.repartition(F.col(DATE_COL), bucket).sortWithinPartitions(SERIES, TS)
        (
            out.write.mode(mode)
            .option("mergeSchema", "true")
            .partitionBy(DATE_COL)
            .parquet(self.path)
        )

    def compact(
        self,
        files_per_day: int = 1,
        dates: list | None = None,
    ) -> None:
        """Small-file compaction — the maintenance job continuous ingest
        needs: streaming micro-batches append a few rows per trigger, so
        a day accumulates hundreds of tiny files whose per-file open
        cost dominates scans long before data volume does. Rewrites
        each (selected) date partition into ``files_per_day`` files,
        restoring the (series, ts) in-file clustering the bulk write
        path produces.

        ``dates`` limits the rewrite to specific ``ts_date`` values
        (normal operation: yesterday's partition, once, after ingest
        moves on — compaction cost stays O(one day), not O(table)).
        Uses dynamic partition overwrite so untouched dates are never
        rewritten; the read is materialized (localCheckpoint) first so
        the job never overwrites files it is still reading. Same
        atomicity caveat as any non-transactional parquet rewrite:
        concurrent readers of the exact partition being swapped can see
        a partial listing; run it when the partition is cold.
        """
        df = self.read()
        if dates is not None:
            df = df.filter(F.col(DATE_COL).isin([str(d) for d in dates]))
        bucket = F.pmod(F.hash(F.col(SERIES)), F.lit(files_per_day))
        out = (
            df.repartition(F.col(DATE_COL), bucket)
            .sortWithinPartitions(SERIES, TS)
            .localCheckpoint(eager=True)
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(DATE_COL)
            .parquet(self.path)
        )

    @staticmethod
    def _ts_expr(df: DataFrame):
        # integer `div`, not float `/`: ns-scale longs exceed 2^53 and
        # would round when routed through a double
        if dict(df.dtypes)[TS] in ("bigint", "long"):
            return F.timestamp_micros(F.expr(f"{TS} div 1000"))
        return F.col(TS)

    # ------------------------------------------------------------------- read
    def read(self) -> DataFrame:
        return self.spark.read.option("mergeSchema", "true").parquet(self.path)

    def fetch(
        self,
        series: str | list[str] | None = None,
        start=None,
        end=None,
        ordered: bool = True,
    ) -> DataFrame:
        """Time-ordered scan of one/many/all series in ``[start, end)``.

        Equivalent of Fetch + BoostSeriesIterator (m3dbseriesfamily.go:
        188-222, boostseriesiterator.go:157-343): the implicit time range
        every reference query carries (query/executor/executor.go:145-147)
        is an explicit predicate here, which Catalyst turns into partition
        pruning + parquet row-group skipping.
        """
        df = self.read()
        if series is not None:
            if isinstance(series, str):
                df = df.filter(F.col(SERIES) == series)
            else:
                df = df.filter(F.col(SERIES).isin(series))
        df = apply_time_range(df, start, end)
        if ordered:
            # Per-series time order with deterministic tie-break — the
            # contract the k-way merge iterator provides
            # (boostseriesiterator.go:301-343).
            df = df.orderBy(SERIES, TS)
        return df

    def register(self) -> DataFrame:
        df = self.read()
        df.createOrReplaceTempView(self.view_name)
        return df


def apply_time_range(df: DataFrame, start=None, end=None, ts_col: str = TS) -> DataFrame:
    """``[start, end)`` half-open time-range predicate (executor.go:239-252).

    Works for TimestampType and INT64-ns ``ts`` columns alike; INT64-ns
    bounds against a timestamp column are converted literal-side so the
    predicate still reaches the parquet scan as PushedFilters.
    """

    def _lit(v):
        if isinstance(v, int):
            from boostdb_spark.functions.scalar import ts_lit

            return ts_lit(df, v, col=ts_col)
        return F.lit(v)

    if start is not None:
        df = df.filter(F.col(ts_col) >= _lit(start))
    if end is not None:
        df = df.filter(F.col(ts_col) < _lit(end))
    return df
