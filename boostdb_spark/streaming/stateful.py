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
