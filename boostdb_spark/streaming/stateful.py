"""Custom stateful streaming operator: per-key running aggregate via
``applyInPandasWithState`` (Arrow-batched — the fast Python path).

This is the one genuinely stateful capability in the engine (SURVEY.md
§7 "hard parts"): the reference keeps cross-slice executor state —
resumable iterator positions carried between ``Execute()`` calls
(query/executor/executor.go:207-237, pendingCompletionNodes) — so a
query's partial progress survives time slices. Spark's equivalent of
"state that outlives a micro-batch" is the state store, surfaced to
Python as ``applyInPandasWithState``.

``running_aggregate`` maintains (count, sum, min, max) per key across
ALL micro-batches and emits the updated totals for keys touched in each
batch — e.g. a live per-series datapoint counter over an ingest stream.

Scale posture: state is partitioned by the grouping key across
executors (RocksDB-backed state store on real clusters); each batch
shuffles only that batch's rows; state size is O(distinct keys), not
O(rows). A GroupStateTimeout can evict idle keys for unbounded key
spaces.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("vmin", DoubleType()),
        StructField("vmax", DoubleType()),
    ]
)


def _output_schema(key_cols: Sequence[str]) -> StructType:
    return StructType(
        [StructField(k, StringType()) for k in key_cols]
        + [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("vmin", DoubleType()),
            StructField("vmax", DoubleType()),
        ]
    )


def running_aggregate(
    df: DataFrame,
    key_cols: Sequence[str] = ("series",),
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-key running (count, sum, min, max), updated and
    emitted each micro-batch the key appears in.

    Keys are cast to string in the output schema (deterministic and
    join-backable); the value column must be numeric.
    """
    key_cols = list(key_cols)
    out_schema = _output_schema(key_cols)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, vmin, vmax = state.get
        else:
            n, total, vmin, vmax = 0, 0.0, None, None
        for pdf in pdfs:
            v = pdf[value_col].dropna()
            if len(v) == 0:
                continue
            n += int(len(v))
            total += float(v.sum())
            bmin, bmax = float(v.min()), float(v.max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
        state.update((n, total, vmin, vmax))
        row = {k: [str(kv)] for k, kv in zip(key_cols, key)}
        row.update({"n": [n], "total": [total], "vmin": [vmin], "vmax": [vmax]})
        yield pd.DataFrame(row)

    grouped = df.groupBy(*key_cols)
    return grouped.applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_STATE_SCHEMA = StructType(
    [StructField("ewma", DoubleType()), StructField("n", LongType())]
)


def streaming_ewma(
    df: DataFrame,
    alpha: float,
    key_cols: Sequence[str] = ("series",),
    value_col: str = "value",
    ts_col: str = "ts",
    order_extra: Sequence[str] = (),
) -> DataFrame:
    """Streaming per-key EWMA: the sequential recursion of
    operators/timeseries.ewma_rows carried ACROSS micro-batches in the
    state store — s_0 = v_0, s_i = alpha*v_i + (1-alpha)*s_{i-1}, with
    exactly the batch fold's arithmetic, so once the stream drains the
    final state bit-matches ewma_final on the same rows.

    Rows are folded in (ts, *order_extra) order WITHIN each micro-batch;
    cross-batch correctness requires the source to deliver batches in
    time order (true for time-partitioned landing directories and for
    per-key-partitioned Kafka — the same assumption every streaming
    EWMA/irate implementation makes). State is O(1) per key: (ewma, n).
    """
    key_cols = list(key_cols)
    order_cols = [ts_col, *order_extra]
    a = float(alpha)
    out_schema = StructType(
        [StructField(k, StringType()) for k in key_cols]
        + [StructField("ewma", DoubleType()), StructField("n", LongType())]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ew, n = state.get
        else:
            ew, n = None, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(order_cols, kind="mergesort")
        for v in batch[value_col]:
            v = float(v)
            ew = v if n == 0 else a * v + (1.0 - a) * ew
            n += 1
        state.update((ew, n))
        row = {k: [str(kv)] for k, kv in zip(key_cols, key)}
        row.update({"ewma": [ew], "n": [n]})
        yield pd.DataFrame(row)

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def upsert_view(
    stream_df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    state_dir: str,
    checkpoint: str,
    order_extra: Sequence[str] = (),
    query_name: str | None = None,
):
    """Streaming UPSERT materialized view: maintain a keyed
    latest-state parquet table from a stream — the
    materialized-view/CDC-apply pattern (what MERGE INTO does on
    transactional formats, expressed on plain parquet). Each
    micro-batch merges into the persisted state: union current state
    with the batch, keep ONE row per key by (ts DESC, *order_extra
    DESC) — ties broken deterministically — and atomically replace the
    state table. Returns the started StreamingQuery; read
    ``state_dir`` after termination for the view.

    The merged result LOCALCHECKPOINTS before the overwrite (you
    cannot overwrite a parquet dir that the plan being written still
    reads); state size is O(distinct keys) — the materialized view is
    bounded by construction, so the per-batch materialization is the
    same order as the view itself.

    Scale: per batch one shuffle on the key for the window; the state
    table re-reads as a plain pruned scan. For truly huge key spaces
    partition ``state_dir`` writes by a key hash so each batch
    rewrites only touched partitions (the continuous-rollup entries
    demonstrate that dynamic-overwrite variant)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    keys = list(key_cols)
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in order_extra]

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            cur = spark.read.parquet(state_dir)
            allr = cur.unionByName(batch_df)
        except Exception:  # first batch: no state yet
            allr = batch_df
        w = Window.partitionBy(*keys).orderBy(*order)
        latest = (
            allr.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint()  # materialize BEFORE overwriting the input
        )
        latest.write.mode("overwrite").parquet(state_dir)

    writer = (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()
