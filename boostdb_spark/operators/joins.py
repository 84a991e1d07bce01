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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    bucket: int,
    left_range: tuple[str, str] = ("start", "end"),
    right_range: tuple[str, str] = ("start", "end"),
    suffix: str = "_right",
    pair_key: Sequence[str] | None = None,
) -> DataFrame:
    """Interval-overlap join at scale: pairs of rows (same equi-keys
    ``on``) whose [start, end] ranges intersect. The naive plan is a
    theta join (cartesian per key group); this one explodes each
    interval into the fixed-width time buckets it covers and equi-joins
    on (keys..., bucket) — candidate volume is bounded by
    intervals-per-bucket, never |L|x|R|, and the no-cartesian guard
    holds. A pair spanning several shared buckets appears once
    (dropDuplicates on the pair's natural key: both ranges).

    Pick ``bucket`` near the typical interval length: much smaller
    multiplies the explode fanout, much larger multiplies candidates
    per bucket — the standard binned-range-join tradeoff (same knob as
    any interval index).

    Ranges are numeric (e.g. INT64 ns); closed-interval overlap:
    ``l.start <= r.end AND r.start <= l.end``. ``pair_key`` names the
    columns that uniquely identify a pair for the multi-bucket dedup
    (default: every output column — plain set semantics).
    """
    on = list(on)
    ls, le = left_range
    rs, re_ = right_range

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        b = F.explode(
            F.sequence(
                (F.col(s) - F.col(s) % bucket).cast("long"),
                (F.col(e) - F.col(e) % bucket).cast("long"),
                F.lit(bucket).cast("long"),
            )
        )
        return df.withColumn("_bk", b)

    lb = bucketed(left, ls, le)
    rename = {
        c: f"{c}{suffix}" for c in right.columns if c not in on and c in left.columns
    }
    rb = bucketed(right, rs, re_)
    for old, new in rename.items():
        rb = rb.withColumnRenamed(old, new)
    rs2, re2 = rename.get(rs, rs), rename.get(re_, re_)
    pairs = lb.join(rb, [*on, "_bk"]).filter(
        (F.col(ls) <= F.col(re2)) & (F.col(rs2) <= F.col(le))
    )
    out = pairs.drop("_bk")
    return out.dropDuplicates(list(pair_key) if pair_key else None)


def range_lookup(
    facts: DataFrame,
    dims: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    keys: Sequence[str] = (),
    how: str = "left",
) -> DataFrame:
    """Point-in-range dimension lookup: each fact row matched to the
    NON-OVERLAPPING dim range containing its value (``lo <= v < hi``)
    — the banding join behind price tiers, geo/IP ranges, SLA buckets.

    Physical strategy by shape:

    - ``keys`` given (per-key range tables): the union+window trick —
      tag both sides, ONE window partitioned by ``keys`` ordered by
      (point, side) carries the latest dim row struct onto each fact,
      then a residual ``v < hi`` filter drops facts falling in a gap.
      One shuffle regardless of dim size, no nested loop — the as-of
      join's 100 TB shape.
    - ``keys`` empty: a keyless window would funnel EVERYTHING through
      one partition, so a single global range table instead joins as a
      broadcast theta join — the right plan when the dim is a small
      lookup table (tiers, buckets), which a keyless banding dim
      always is; the fact side streams with no shuffle at all.

    Overlap semantics are IDENTICAL in both branches: the range with
    the largest ``lo <= v`` claims the point, and the fact matches iff
    ``v < that range's hi`` (latest-start wins; a point shadowed into a
    gap matches nothing). The keyed union+window computes this
    directly; the keyless branch gets the same result by clipping each
    range's ``hi`` to the next range's ``lo`` before the theta join,
    which also makes a fact row match AT MOST ONE range (no duplicate
    fan-out on overlapping dims). Ranges sharing an identical ``lo``
    tie-break deterministically on ``hi`` (the wider range wins).
    ``how='left'`` keeps unmatched facts with NULL dim payload;
    ``'inner'`` drops them. Dim payload columns colliding with fact
    names get a ``_dim`` suffix; the internal ``_ord``/``_side``/
    ``_hit``/``_lo``/``_hi``/``_d_row`` markers are reserved and
    rejected as fact column names AND as dim key/payload names (per
    branch), rather than silently shadowing or dropping payload."""
    from pyspark.sql import Window

    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    reserved = {"_ord", "_side", "_hit", "_lo", "_hi", "_d_row"}
    clash = reserved.intersection(facts.columns)
    if clash:
        raise ValueError(
            f"range_lookup: fact columns {sorted(clash)} collide with "
            "reserved internal marker names — rename them first"
        )
    keys = list(keys)
    payload = [c for c in dims.columns if c not in (*keys, lo_col, hi_col)]
    dim_reserved = (
        {"_lo", "_hi"} if not keys else {"_ord", "_side", "_d_row", "_hit"}
    )
    dim_clash = dim_reserved.intersection(payload if not keys else (*keys, *payload))
    if dim_clash:
        raise ValueError(
            f"range_lookup: dim {'payload' if not keys else 'key/payload'} "
            f"columns {sorted(dim_clash)} collide with reserved internal "
            "marker names — rename them first"
        )
    if not keys:
        v = F.col(value_col).cast("double")
        # latest-start-wins, expressed statically: clip each range's hi
        # to the next range's lo (ordered by lo, wider range first on
        # ties). For the argmax-lo candidate the clip never binds below
        # v; for every shadowed range it excludes v — exactly the keyed
        # branch's carried-row semantics, with disjoint intervals as a
        # bonus (a fact row joins at most one dim row). The window is
        # keyless but runs over the dim table only, which is tiny by
        # the branch's own contract (it is broadcast next).
        # ties on lo sort narrower-first so the clip empties the
        # narrower range and the WIDER one survives
        wd = Window.orderBy(F.col("_lo").asc(), F.col("_hi").asc())
        d = F.broadcast(
            dims.select(
                F.col(lo_col).cast("double").alias("_lo"),
                F.col(hi_col).cast("double").alias("_hi"),
                *[
                    F.col(c).alias(f"{c}_dim" if c in facts.columns else c)
                    for c in payload
                ],
            )
            .withColumn(
                "_hi",
                F.least(
                    F.col("_hi"),
                    F.lead("_lo", 1, float("inf")).over(wd),
                ),
            )
            .filter(F.col("_lo") < F.col("_hi"))
        )
        cond = (v >= F.col("_lo")) & (v < F.col("_hi"))
        out = facts.join(d, cond, how)
        return out.drop("_lo", "_hi")
    f2 = facts.withColumn("_ord", F.col(value_col).cast("double")).withColumn(
        "_side", F.lit(1)
    )
    d2 = dims.select(
        *keys,
        F.col(lo_col).cast("double").alias("_ord"),
        F.struct(
            F.col(lo_col).cast("double").alias("_lo"),
            F.col(hi_col).cast("double").alias("_hi"),
            *[F.col(c).alias(f"_p_{c}") for c in payload],
        ).alias("_d_row"),
    ).withColumn("_side", F.lit(0))
    u = f2.unionByName(d2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        # _hi tie-break: dim rows sharing an identical lo sort
        # narrower-first, so last() carries the WIDER range — the same
        # deterministic tie the keyless branch's clip implements. Fact
        # rows (_side=1, _d_row NULL) sort after every equal-_ord dim
        # row regardless; nulls_first keeps them inert in the key.
        .orderBy(
            F.col("_ord").asc(),
            F.col("_side").asc(),
            F.col("_d_row").getField("_hi").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col("_d_row"), ignorenulls=True).over(w)
    hit = carried.isNotNull() & (F.col("_ord") < carried.getField("_hi"))
    out = (
        u.select(
            *facts.columns,
            F.col("_side"),
            *[
                F.when(hit, carried.getField(f"_p_{c}")).alias(
                    f"{c}_dim" if c in facts.columns else c
                )
                for c in payload
            ],
            hit.alias("_hit"),
        )
        .filter(F.col("_side") == 1)
        .drop("_side")
    )
    if how == "inner":
        out = out.filter(F.col("_hit"))
    return out.drop("_hit")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two snapshots of a table: rows only
    in ``new`` are ``insert``, rows only in ``old`` are ``delete``,
    rows in both whose compared payload differs are ``update``;
    unchanged rows are dropped. The incremental-maintenance primitive
    a plain-Parquet lake needs where a transactional format would read
    a commit log — and the Spark-side diff is ONE full-outer sort-merge
    join on the key (both sides shuffle-partitioned identically, no
    driver materialization), so it survives 100 TB snapshots; bucket
    both snapshots on the key (sources/bucketing.py) and even that
    exchange disappears. Payload comparison is null-safe (``<=>``), so
    NULL -> value and value -> NULL transitions surface as updates.

    Output: ``(*keys, op, old_<c>..., new_<c>...)`` with the missing
    side's payload NULL for insert/delete.

    Precondition (standard CDC): ``keys`` uniquely identify a row in
    EACH snapshot. Duplicate keys fan the full-outer join out to the
    pair product for that key — not validated here because a
    uniqueness check costs a full aggregation pass per snapshot; run
    one upstream when the key is not known-unique."""
    from functools import reduce as _reduce

    keys = list(keys)
    if not keys:
        raise ValueError("snapshot_diff: at least one key column required")
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    compare_cols = list(compare_cols)
    if not compare_cols:
        raise ValueError("snapshot_diff: no payload columns to compare")
    reserved = {"op", "_o", "_n"} | {
        f"{p}_{c}" for c in compare_cols for p in ("old", "new")
    }
    clash = reserved.intersection(keys)
    if clash:
        raise ValueError(
            f"snapshot_diff: key columns {sorted(clash)} collide with "
            "reserved output/marker names — rename them first"
        )
    for side, df in (("old", old), ("new", new)):
        missing = [c for c in (*keys, *compare_cols) if c not in df.columns]
        if missing:
            raise ValueError(f"snapshot_diff: {side} side lacks {missing}")
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("_o", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("_n", F.lit(True))
    j = o.join(n, keys, "full_outer")
    same = _reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
    )
    op = (
        F.when(F.col("_o").isNull(), F.lit("insert"))
        .when(F.col("_n").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *keys, "op",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def snapshot_apply(
    old: DataFrame,
    diff: DataFrame,
    keys: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Apply a :func:`snapshot_diff` changeset to the OLD snapshot and
    reproduce the NEW one — the MERGE-INTO half of plain-parquet CDC:
    deletes drop, updates replace the payload, inserts append. Together
    with snapshot_diff this closes the incremental-maintenance loop
    (``apply(old, diff(old, new)) == new`` exactly, which the
    scan_snapshot_apply suite entry hash-certifies).

    Shape: one left anti/outer join of old against the (small relative
    to the table) changeset on the key, plus a union of the insert
    rows — all key-partitioned; bucket both sides on the key and the
    exchanges disappear. No driver materialization."""
    keys = list(keys)
    upd = diff.filter(F.col("op") == "update").select(
        *keys,
        *[F.col(f"new_{c}").alias(f"_n_{c}") for c in payload_cols],
        F.lit(True).alias("_upd"),
    )
    dels = diff.filter(F.col("op") == "delete").select(*keys)
    ins = diff.filter(F.col("op") == "insert").select(
        *keys, *[F.col(f"new_{c}").alias(c) for c in payload_cols]
    )
    survived = old.join(dels, keys, "left_anti")
    # an explicit update marker, NOT coalesce: a null-safe diff can
    # legitimately update a payload TO NULL, and coalesce would
    # silently keep the old value instead
    merged = survived.join(upd, keys, "left").select(
        *keys,
        *[
            F.when(F.col("_upd"), F.col(f"_n_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload_cols
        ],
    )
    return merged.unionByName(ins)
