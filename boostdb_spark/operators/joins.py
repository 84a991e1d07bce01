"""Join strategy utilities for scale: explicit broadcast and salted
(skew-resistant) equi-joins.

The reference parses joins but never executes them (`AddJoinOp` has an
empty body — query/base/queryops.go:60-66; grammar at
query/parser/joinparser.go:84-201). Spark executes them; these helpers
encode the two decisions Catalyst can't always make alone:

- ``broadcast_join``: force the small side to broadcast (dimension
  tables, symbol maps) — no shuffle of the big side at all.
- ``salted_join``: for heavy-hitter keys that overwhelm one reducer
  even with AQE skew splitting (a single key larger than a partition):
  explode the BUILD side into ``salt_buckets`` replicas and scatter the
  PROBE side uniformly across them, so one hot key spreads over
  ``salt_buckets`` reducers. Cost: build-side rows x salt_buckets —
  use for small-to-medium build sides against skewed probes.

First resort remains AQE (enabled in session.py:
``spark.sql.adaptive.skewJoin.enabled``); salting is the explicit
escape hatch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_join(
    big: DataFrame, small: DataFrame, on: Sequence[str] | str, how: str = "inner"
) -> DataFrame:
    """Equi-join with the small side pinned to broadcast."""
    return big.join(F.broadcast(small), on=on, how=how)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str] | str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: probe rows get a deterministic salt in
    ``[0, salt_buckets)`` (hash of all probe columns — uniform, not
    key-derived, so hot keys scatter); build rows are replicated once
    per bucket. Joining on (key..., salt) spreads each hot key over
    ``salt_buckets`` reducers. Output equals ``probe.join(build, on,
    how)`` exactly.

    Supported ``how``: inner / left (semantics where build replication
    cannot manufacture duplicates or drop rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    on = [on] if isinstance(on, str) else list(on)
    probe_s = probe.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(salt_buckets))
    )
    build_s = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = probe_s.join(build_s, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


def auto_salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
    sample_fraction: float = 0.05,
    max_buckets: int = 64,
    seed: int = 42,
) -> DataFrame:
    """:func:`salted_join` with the bucket count DERIVED from the data:
    a seeded sample of the probe side estimates the heaviest key's row
    share p_max; that key needs ~p_max * shuffle_partitions reducers to
    be no worse than the average partition, so salt_buckets =
    clamp(ceil(p_max * P), 1, max_buckets). When the estimate says the
    key distribution is near-uniform (p_max <= 2/P — AQE territory),
    the plain join plans instead: no replication cost for nothing.

    Cost model: the sample is ONE extra job producing two scalars
    (never a key list on the driver); at 100 TB use a smaller
    ``sample_fraction`` — the estimate only has to get the ORDER of
    the skew right, the clamp absorbs the rest. Output is identical to
    ``probe.join(build, on, how)`` regardless of the derived count
    (salting never changes join semantics, only placement).
    """
    import math

    on_l = [on] if isinstance(on, str) else list(on)
    spark = probe.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    stats = (
        probe.select(*on_l)
        .sample(fraction=sample_fraction, seed=seed)
        .groupBy(*on_l)
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
        .first()
    )
    if not stats or not stats["tot"]:
        return probe.join(build, on=on_l, how=how)
    share = stats["mx"] / stats["tot"]
    if share <= 2.0 / n_part:
        return probe.join(build, on=on_l, how=how)
    buckets = min(max_buckets, max(2, math.ceil(share * n_part)))
    return salted_join(probe, build, on_l, salt_buckets=buckets, how=how)
