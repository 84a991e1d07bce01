"""Structured Streaming surface — the idiomatic realization of the
reference's time-sliced execution loop and async write pipeline
(query/executor/executor.go:239-252 drives one Execute() per time
slice; client/boostsession.go:149-184 fire-and-forget writes with a
backpressure gate). On Spark both collapse into Structured Streaming
micro-batches: the trigger is the slice clock, checkpointing is the
durability barrier, and `maxFilesPerTrigger` is the backpressure gate.
"""

from boostdb_spark.streaming.ingest import read_family_stream, stream_write
from boostdb_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from boostdb_spark.streaming.stateful import running_aggregate, streaming_ewma
from boostdb_spark.streaming.slices import (
    execute_sliced,
    foreach_slice,
    time_slices,
)
from boostdb_spark.streaming.rollup import continuous_rollup, continuous_rollup_merged

__all__ = [
    "read_family_stream",
    "stream_write",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "running_aggregate",
    "streaming_ewma",
    "time_slices",
    "execute_sliced",
    "foreach_slice",
    "continuous_rollup",
    "continuous_rollup_merged",
]
