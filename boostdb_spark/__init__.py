"""boostdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rmravindran/boostdb.

The reference (/root/reference, Go) is a time-series database layer on M3DB:
series families of float64 datapoints with series-level tags and per-datapoint
string attributes, fronted by a SQL-like distributed query engine
(reference README.md:4-8). This package re-expresses those capabilities
idiomatically on Spark:

- series family -> time-partitioned Parquet table (``sources.seriesfamily``)
- symbol-table dictionary encoding -> Parquet native dictionary encoding
- SQL front (SELECT/WHERE/JOIN/GROUP BY, ``alias.series.attr`` sugar,
  implicit time ranges) -> Spark SQL / Catalyst (``plans.sugar``, ``session``)
- time-sliced batch executor -> partition-pruned reads + Structured
  Streaming micro-batches (``streaming``)
- rich time-series functions (north star, reference README.md:8) ->
  ``operators.timeseries``
- LLM-data-pipeline operators (dedup, similarity, text, multimodal) ->
  ``operators.dedup`` / ``operators.similarity`` / ``operators.text`` /
  ``operators.multimodal``

Nothing here ports the reference's storage mechanics (symbol tables,
annotations, shard round-robin, resumable iterators) — Parquet + Catalyst
subsume them (SURVEY.md section 4).
"""

from boostdb_spark.session import BoostSession, get_spark

__all__ = ["BoostSession", "get_spark"]

__version__ = "0.2.0"
