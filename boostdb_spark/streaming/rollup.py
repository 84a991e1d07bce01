"""Continuous rollup maintenance: a streaming windowed aggregation that
keeps a queryable Parquet rollup table current — the materialized
time-bucket rollup every monitoring TSDB ships (and the reference's
"rich time-series functions" north star implies, reference
README.md:8), done Spark-idiomatically:

  source stream -> update-mode tumbling agg (state holds each open
  window's running totals) -> foreachBatch: dynamic partition
  overwrite of exactly the windows touched this batch.

Idempotence: the sink is partitioned by (win_start, *keys) — exactly
the grouping key — so re-emitting a group replaces that group's
directory atomically with its latest cumulative totals; unchanged
groups in the same window are untouched (update mode emits ONLY
changed groups, so partitioning by window alone would delete a
window's unchanged keys on overwrite). Replayed batches (restart,
at-least-once delivery) converge to the same table. No transactional
table format needed.

Cardinality note: one directory per (window, key) — right for rollup
keys (series/type/dc: bounded). For high-cardinality keys, swap the
sink for a MERGE into a transactional table format; the streaming side
is unchanged.

Scale posture: state is O(open windows x keys) (bounded by the
watermark); each batch writes only touched partitions; readers prune
by window directory. One shuffle per batch on (window, keys) —
identical to the batch bucket_agg plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from boostdb_spark.streaming.windows import tumbling_agg


def continuous_rollup(
    stream_df: DataFrame,
    rollup_path: str,
    checkpoint: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Maintain a tumbling-window rollup table at ``rollup_path``.

    Output schema: (win_start, win_end, *keys, *aggs) partitioned by
    ``win_start``. Read it back with ``spark.read.parquet(rollup_path)``.
    """
    agg_stream = tumbling_agg(
        stream_df, duration, list(keys), list(aggs), ts_col=ts_col, watermark=watermark
    )

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        # NOTE (r15, measured and REJECTED): coalesce(1) before this
        # write — one file instead of up to N per (win_start, keys)
        # dir — read 2.2-2.3 s/batch -> 2.8-3.2 s/batch in interleaved
        # A/B: the parallel parquet encoding across tasks outweighs the
        # halved FS commit ops at every batch size this sink's bounded-
        # key contract allows. Left parallel.
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("win_start", *keys)
            .parquet(rollup_path)
        )

    return (
        agg_stream.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def continuous_rollup_merged(
    stream_df: DataFrame,
    rollup_path: str,
    checkpoint: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    trigger: dict | None = None,
) -> StreamingQuery:
    """High-cardinality variant of :func:`continuous_rollup`: the sink
    is partitioned by ``win_start`` ONLY, and each batch MERGES its
    changed groups into the touched window partitions (read the
    partition, anti-join out the keys being replaced, union the new
    cumulative totals, rewrite). Keys live as rows inside a window
    partition instead of one directory per (window, key) — directory
    count is O(windows) regardless of key cardinality.

    This emulates MERGE INTO on plain Parquet: the read side is
    materialized (localCheckpoint) before the dynamic partition
    overwrite, so Spark never overwrites a path it is still reading.
    Idempotent under replay for the same reason as the partitioned
    variant: update-mode emits cumulative per-(window,key) totals, so
    re-merging a batch replaces rows with identical values. The
    rewrite cost is O(rows in touched windows) per batch — right when
    keys are many but each batch touches few windows; with bounded
    keys prefer :func:`continuous_rollup`'s per-group overwrite. On a
    transactional table format the same stream plugs into a real MERGE.
    """
    agg_stream = tumbling_agg(
        stream_df, duration, list(keys), list(aggs), ts_col=ts_col, watermark=watermark
    )
    key_cols = ["win_start", *keys]

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        # LAZY checkpoint + let the bounds collect materialize it: the
        # eager-checkpoint-then-agg pair was 2 driver-synchronous jobs
        # per batch for one materialization (r15, same fusion as
        # operators/dedup.py::dedup_groups); the batch stays protected
        # from the read-modify-write hazard below because the bounds
        # job persists it before the overwrite job runs.
        batch_df = batch_df.localCheckpoint(eager=False)
        # replaceWhere-style bounds: ONE scalar row of driver traffic
        # regardless of how many windows the batch touched (a distinct
        # win_start collect would be O(windows) per batch). Windows
        # inside [lo, hi] the batch did NOT touch are re-written with
        # unchanged content — same result, bounded extra IO, and the
        # batch's own windows are contiguous under event-time ordering
        # so the range is tight in practice.
        bounds = batch_df.agg(
            F.min("win_start").alias("lo"), F.max("win_start").alias("hi")
        ).first()
        if bounds["lo"] is None:
            return
        try:
            cur = spark.read.parquet(rollup_path)
        except Exception:  # first batch: nothing to merge yet
            cur = None
        merged = batch_df
        if cur is not None:
            keep = (
                cur.filter(
                    F.col("win_start").between(bounds["lo"], bounds["hi"])
                )
                .join(batch_df.select(*key_cols), key_cols, "left_anti")
            )
            merged = keep.unionByName(batch_df)
        # break lineage from rollup_path before overwriting it
        merged = merged.localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("win_start")
            .parquet(rollup_path)
        )

    return (
        agg_stream.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
