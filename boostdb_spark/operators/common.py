"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def no_broadcast(df: DataFrame) -> DataFrame:
    """Pin a CORPUS-SCALED relation out of static broadcast planning.

    Catalyst's size estimate does not grow through explode/generate:
    a shingle or band table exploded from a 35 MB documents scan is
    still "35 MB" to the planner, so with any finite
    autoBroadcastJoinThreshold the static plan happily broadcasts a
    relation that is GBs in memory — the sf10 probe caught
    dedup_minhash_lsh dying exactly this way ("Not enough memory to
    build and broadcast", 500k docs x 16 bands hashed-relation on an
    8g driver) while sf0.1/sf1 fit by luck. The merge hint pins the
    join to sort-merge — measured: AQE does NOT override a user join
    hint, so this is a hard guarantee, bought at the cost of a sort
    where a small-SF broadcast would have won. That trade is the
    point: a join whose build side GROWS WITH THE CORPUS must never
    depend on an estimate to stay safe. Apply to every join side that
    scales with the corpus (exploded shingles/tokens/bands, per-doc
    size tables, candidate-pair tables); leave genuinely bounded sides
    (centroid tables, dimension lookups, band-count constants) to the
    optimizer."""
    return df.hint("merge")


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism before CPU-heavy
    per-row work. A small input (one parquet file -> one partition)
    would otherwise pin the whole computation to a single core; at real
    scale the scan already has >= defaultParallelism partitions and
    this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
