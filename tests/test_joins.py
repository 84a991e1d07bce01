"""Join utilities: salted join must equal the plain join exactly (skew
scattering is a physical rewrite, not a semantic one); broadcast join
must actually broadcast."""

from pyspark.sql import functions as F

from boostdb_spark.operators.joins import broadcast_join, salted_join
from tests.conftest import SF_DIR


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )


def _dim(spark):
    # tiny per-type dimension
    return (
        _events(spark)
        .groupBy("event_type")
        .agg(F.count("*").alias("type_total"))
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_equals_plain(spark):
    e, d = _events(spark), _dim(spark)
    want = _sorted_rows(e.join(d, "event_type"))
    got = _sorted_rows(salted_join(e, d, "event_type", salt_buckets=8))
    assert got == want and len(got) > 0


def test_salted_left_equals_plain(spark):
    e = _events(spark)
    d = _dim(spark).filter(F.col("event_type") != "click")  # force unmatched rows
    want = _sorted_rows(e.join(d, "event_type", "left"))
    got = _sorted_rows(salted_join(e, d, "event_type", salt_buckets=8, how="left"))
    assert got == want
    assert any(r[-1] is None for r in got)  # unmatched left rows survive


def test_auto_salted_skewed_input_salts_and_matches(spark):
    """One key owning ~70% of rows: the sampled histogram must derive
    buckets > 1 (plan contains the salt join key) and the result must
    still equal the plain join exactly."""
    from boostdb_spark.operators.joins import auto_salted_join

    probe = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 7, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        F.col("id").alias("pid"),
    )
    build = probe.select("k").distinct().withColumn("bval", F.length("k"))
    out = auto_salted_join(probe, build, "k", sample_fraction=0.5)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "_salt" in plan, "skewed input should take the salted path"
    assert _sorted_rows(out) == _sorted_rows(probe.join(build, "k"))


def test_auto_salted_uniform_input_plans_plain(spark):
    """Near-uniform keys: the estimator must conclude AQE territory and
    return the UNSALTED join (no build replication for nothing)."""
    from boostdb_spark.operators.joins import auto_salted_join

    probe = spark.range(0, 20000).select(
        (F.col("id") % 1000).cast("string").alias("k"),
        F.col("id").alias("pid"),
    )
    build = probe.select("k").distinct().withColumn("bval", F.length("k"))
    out = auto_salted_join(probe, build, "k", sample_fraction=0.5)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "_salt" not in plan, "uniform input must not pay salting"
    assert _sorted_rows(out) == _sorted_rows(probe.join(build, "k"))


def test_broadcast_join_plan(spark):
    e, d = _events(spark), _dim(spark)
    plan = broadcast_join(e, d, "event_type")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_range_lookup_keyed_and_keyless(spark):
    from boostdb_spark.operators.joins import range_lookup

    facts = spark.createDataFrame(
        [(1, 5.0), (2, 49.9), (3, 50.0), (4, 250.0), (5, -1.0)],
        "id long, v double",
    )
    dims = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 200.0, "mid"), (200.0, 1000.0, "high")],
        "lo double, hi double, tier string",
    )
    out = {r.id: r.tier for r in range_lookup(facts, dims, "v").collect()}
    assert out == {1: "low", 2: "low", 3: "mid", 4: "high", 5: None}
    assert range_lookup(facts, dims, "v", how="inner").count() == 4
    # keyless plans the broadcast theta join (small lookup table)
    p = range_lookup(facts, dims, "v")._jdf.queryExecution().executedPlan()
    assert "BroadcastNestedLoopJoin" in p.toString()

    # keyed path: per-key range tables, union+window, NO join node
    fk = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 75.0), ("b", 3, 5.0), ("b", 4, 50.0)],
        "k string, id long, v double",
    )
    dk = spark.createDataFrame(
        [("a", 0.0, 50.0, "a-low"), ("a", 50.0, 100.0, "a-mid"),
         ("b", 0.0, 10.0, "b-low")],
        "k string, lo double, hi double, tier string",
    )
    got = {r.id: r.tier for r in range_lookup(fk, dk, "v", keys=["k"]).collect()}
    assert got == {1: "a-low", 2: "a-mid", 3: "b-low", 4: None}
    plan = (
        range_lookup(fk, dk, "v", keys=["k"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_range_lookup_overlap_semantics_match_across_branches(spark):
    """Overlapping dims: BOTH branches implement latest-start-wins —
    the keyed union+window carries the largest lo <= v; the keyless
    clip-to-next-lo must reproduce it exactly, including the shadowed
    gap (v inside an early wide range but past a later narrow range's
    hi matches NOTHING) and without duplicate fan-out."""
    from boostdb_spark.operators.joins import range_lookup

    facts = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 30.0), (4, 55.0), (5, 99.0)],
        "id long, v double",
    )
    # wide [0,100) overlapped by [10,20) and [50,60): 30 and 99 fall in
    # shadowed gaps under latest-start-wins
    dims = spark.createDataFrame(
        [(0.0, 100.0, "wide"), (10.0, 20.0, "n1"), (50.0, 60.0, "n2")],
        "lo double, hi double, tier string",
    )
    keyless = {r.id: r.tier for r in range_lookup(facts, dims, "v").collect()}
    fk = facts.withColumn("k", F.lit("x"))
    dk = dims.withColumn("k", F.lit("x"))
    keyed = {
        r.id: r.tier
        for r in range_lookup(fk, dk, "v", keys=["k"]).collect()
    }
    expect = {1: "wide", 2: "n1", 3: None, 4: "n2", 5: None}
    assert keyless == expect and keyed == expect
    # no duplicate fan-out on the overlap
    assert range_lookup(facts, dims, "v").count() == facts.count()
    # identical lo: the wider range wins, deterministically
    tie = spark.createDataFrame(
        [(0.0, 10.0, "narrow"), (0.0, 40.0, "wider")],
        "lo double, hi double, tier string",
    )
    got = {r.id: r.tier for r in range_lookup(facts, tie, "v").collect()}
    assert got[1] == "wider" and got[3] == "wider" and got[4] is None
    # ... on the KEYED path too (ADVICE r5: the keyed window needs its
    # own _hi tie-break; (_ord, _side) alone leaves equal-lo carry
    # order to partition luck)
    tk = tie.withColumn("k", F.lit("x"))
    gk = {r.id: r.tier for r in range_lookup(fk, tk, "v", keys=["k"]).collect()}
    assert gk[1] == "wider" and gk[3] == "wider" and gk[4] is None
    assert gk == got


def test_range_lookup_validates_inputs_first(spark):
    import pytest as _pt

    from boostdb_spark.operators.joins import range_lookup

    facts = spark.createDataFrame([(1, 5.0)], "id long, v double")
    dims = spark.createDataFrame([(0.0, 10.0, "t")], "lo double, hi double, tier string")
    with _pt.raises(ValueError, match="how must be"):
        range_lookup(facts, dims, "v", how="full")
    bad = facts.withColumnRenamed("id", "_ord")
    with _pt.raises(ValueError, match="reserved"):
        range_lookup(bad, dims, "v")
    # dims payload / key names collide with per-branch internals too
    # (ADVICE r5): keyless reserves _lo/_hi, keyed reserves
    # _ord/_side/_d_row — reject loudly instead of dropping payload
    bad_payload = dims.withColumnRenamed("tier", "_hi")
    with _pt.raises(ValueError, match="reserved"):
        range_lookup(facts, bad_payload, "v")
    with _pt.raises(ValueError, match="reserved"):
        range_lookup(
            facts.withColumn("k", F.lit("x")),
            dims.withColumnRenamed("tier", "_side").withColumn("k", F.lit("x")),
            "v",
            keys=["k"],
        )
    # keyless branch does NOT reserve the keyed markers as dim payload
    ok = dims.withColumnRenamed("tier", "_ord_free")
    assert range_lookup(facts, ok, "v").count() == 1


def test_snapshot_diff_ops_and_null_safety(spark):
    """insert/delete/update classification, NULL<->value transitions
    surfacing as updates, unchanged rows dropped, and loud input
    validation."""
    import pytest as _pt

    from boostdb_spark.operators.joins import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.0), (4, 7.0)],
        "id long, v double",
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 2.0), (3, None), (5, 9.0)],
        "id long, v double",
    )
    got = {
        r["id"]: (r["op"], r["old_v"], r["new_v"])
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {
        2: ("update", None, 2.0),   # NULL -> value
        3: ("update", 5.0, None),   # value -> NULL
        4: ("delete", 7.0, None),
        5: ("insert", None, 9.0),
    }  # id=1 unchanged: absent
    with _pt.raises(ValueError, match="lacks"):
        snapshot_diff(old.drop("v"), new, ["id"], ["v"])
    with _pt.raises(ValueError, match="no payload"):
        snapshot_diff(old.select("id"), new.select("id"), ["id"])


def test_snapshot_diff_reserved_names_and_empty_keys(spark):
    """Keys colliding with output/marker names and empty key lists are
    rejected loudly instead of silently corrupting output (review
    finding: keys=['op'] previously emitted two 'op' columns and lost
    the key data)."""
    import pytest as _pt

    from boostdb_spark.operators.joins import snapshot_diff

    old = spark.createDataFrame([(1, 1.0)], "op long, v double")
    new = spark.createDataFrame([(1, 2.0)], "op long, v double")
    with _pt.raises(ValueError, match="reserved"):
        snapshot_diff(old, new, ["op"], ["v"])
    o2 = spark.createDataFrame([(1, 1.0)], "old_v long, v double")
    with _pt.raises(ValueError, match="reserved"):
        snapshot_diff(o2, o2, ["old_v"], ["v"])
    with _pt.raises(ValueError, match="at least one key"):
        snapshot_diff(old, new, [], ["v"])


def test_range_lookup_keyed_rejects_hit_payload(spark):
    """A dim payload named _hit on the keyed path collides with the
    match marker (dropped or ambiguous) — rejected up front."""
    import pytest as _pt

    from boostdb_spark.operators.joins import range_lookup

    fk = spark.createDataFrame([("a", 1, 5.0)], "k string, id long, v double")
    dk = spark.createDataFrame(
        [("a", 0.0, 10.0, "x")], "k string, lo double, hi double, _hit string"
    )
    with _pt.raises(ValueError, match="reserved"):
        range_lookup(fk, dk, "v", keys=["k"])


def test_snapshot_apply_null_update(spark):
    """An update that sets the payload to NULL must APPLY (the marker
    path), not silently keep the old value (the coalesce trap)."""
    from boostdb_spark.operators.joins import snapshot_apply, snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, None), (2, 20.0), (4, 40.0)], "k long, v double"
    )
    d = snapshot_diff(old, new, keys=["k"], compare_cols=["v"])
    got = snapshot_apply(old, d, keys=["k"], payload_cols=["v"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, new.collect())
    )
