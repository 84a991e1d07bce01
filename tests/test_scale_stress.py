"""Opt-in scale stress (BOOST_STRESS=1): run the heaviest operators on
inputs multiplied well past the fixture scale and assert they complete
with sane output — the local stand-in for the 100 TB posture checks
(no OOM, no cartesian blowup, shuffles bounded).

Excluded from the default run: the driver's per-round pytest should
stay fast. Run manually: BOOST_STRESS=1 python -m pytest
tests/test_scale_stress.py -q
"""

import os

import pytest
from pyspark.sql import functions as F

from boostdb_spark.operators import dedup as dd
from boostdb_spark.operators import timeseries as ts_ops
from tests.conftest import SF_DIR, ts_as_timestamp

pytestmark = pytest.mark.skipif(
    not os.environ.get("BOOST_STRESS"), reason="set BOOST_STRESS=1 to run"
)

SF01 = "/root/testdata/sf0.1"


def _events_x(spark, mult):
    """events replicated mult times with distinct event_ids and shifted
    user_ids (derived from driver fixtures, not synthesized)."""
    e = spark.read.parquet(f"{SF01}/events.parquet")
    n = e.count()
    return (
        e.crossJoin(F.broadcast(spark.range(mult).withColumnRenamed("id", "rep")))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * n)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 1000)
        .drop("rep")
    )


def test_asof_join_5m_rows(spark):
    e = _events_x(spark, 50)  # 5M rows
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = e.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = ts_ops.asof_join(left, right, on=["user_id"], ts_col="ts")
    n_left = left.count()
    assert out.count() == n_left  # left-join semantics: one row per left row


def test_session_windows_5m_rows(spark):
    from boostdb_spark.streaming.windows import session_agg

    e = ts_as_timestamp(_events_x(spark, 50)).withColumn(
        "ts_t", F.col("ts").cast("timestamp")
    )
    out = session_agg(e, "30 minutes", ["user_id"], [F.count("*").alias("n")],
                      ts_col="ts_t")
    agg = out.agg(F.sum("n"), F.count("*")).collect()[0]
    assert agg[0] == e.count()  # every row lands in exactly one session
    assert agg[1] > 0


def test_minhash_100k_docs(spark):
    d = spark.read.parquet(f"{SF01}/documents.parquet")
    n = d.count()
    docs = (
        d.crossJoin(F.broadcast(spark.range(20).withColumnRenamed("id", "rep")))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
        .drop("rep")
    )  # 100k docs incl. 20 exact copies of each -> plenty of true pairs
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.8, num_hashes=32, bands=16, n=3)
    # replicated copies are exact dups: jaccard 1.0 pairs must surface
    assert pairs.filter(F.col("jaccard") >= 0.999).limit(1).count() == 1


def test_ewma_bucketed_matches_sequential(spark):
    """Bounded-memory EWMA (parallel-scan over bucket summaries) vs the
    exact sequential fold: same rows, values within fp-reassociation
    noise, while no task ever holds more than bucket_rows rows of one
    series. One series is 100k rows with bucket_rows=500 -> 200 bucket
    tasks per series."""
    n, series = 100_000, 3
    df = (
        spark.range(n * series)
        .select(
            (F.col("id") % series).cast("string").alias("series"),
            (F.col("id") / series).cast("long").alias("ts"),
            (F.sin(F.col("id").cast("double")) * 100).alias("value"),
        )
    )
    seq = {
        tuple(r[:1]): r["ewma"]
        for r in ts_ops.ewma_final(df, 0.25, series_cols=("series",)).collect()
    }
    buck = {
        tuple(r[:1]): r["ewma"]
        for r in ts_ops.ewma_final(
            df, 0.25, series_cols=("series",), bucket_rows=500
        ).collect()
    }
    assert seq.keys() == buck.keys()
    for k in seq:
        assert abs(seq[k] - buck[k]) <= 1e-9 * max(1.0, abs(seq[k])), k

    rows_seq = ts_ops.ewma_rows(df, 0.25, series_cols=("series",)).collect()
    rows_buck = ts_ops.ewma_rows(
        df, 0.25, series_cols=("series",), bucket_rows=500
    ).collect()
    a = {(r["series"], r["ts"]): r["ewma"] for r in rows_seq}
    b = {(r["series"], r["ts"]): r["ewma"] for r in rows_buck}
    assert a.keys() == b.keys() and len(a) == n * series
    worst = max(abs(a[k] - b[k]) / max(1.0, abs(a[k])) for k in a)
    assert worst <= 1e-9, worst


def test_centroid_bucketed_matches_flat(spark):
    """Bounded-memory centroid (two-level ordered fold) vs the flat
    ordered fold: identical groups/counts, values within
    fp-reassociation noise."""
    from boostdb_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet").withColumn(
        "label", (F.col("vec_id") % 4).cast("string")
    )
    flat = {
        (r["label"], r["pos"]): (r["centroid"], r["n"])
        for r in sim.centroid_per_group(emb).collect()
    }
    buck = {
        (r["label"], r["pos"]): (r["centroid"], r["n"])
        for r in sim.centroid_per_group(emb, bucket_rows=100).collect()
    }
    assert flat.keys() == buck.keys() and len(flat) > 0
    for k in flat:
        assert flat[k][1] == buck[k][1]
        assert abs(flat[k][0] - buck[k][0]) <= 1e-9 * max(1.0, abs(flat[k][0])), k


def test_salted_join_under_heavy_skew(spark):
    """5M-row probe where ONE key owns half the rows: the salted join
    must equal the plain join exactly while spreading the hot key over
    salt_buckets reducers (the plain plan would put ~2.5M rows on one
    task)."""
    from boostdb_spark.operators.joins import salted_join

    n = 5_000_000
    probe = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.pmod(F.col("id"), F.lit(1000)))
        .alias("k"),
        F.col("id").alias("rid"),
    )
    build = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    salted = salted_join(probe, build, on="k", salt_buckets=32)
    agg_s = {
        (r["k"], r["n"], round(r["s"], 3))
        for r in salted.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
        .collect()
    }
    plain = probe.join(build, "k")
    agg_p = {
        (r["k"], r["n"], round(r["s"], 3))
        for r in plain.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
        .collect()
    }
    assert agg_s == agg_p and len(agg_s) > 0


def test_interval_overlap_join_equals_theta(spark):
    """Binned interval join on ~1M replicated intervals must equal the
    naive theta join exactly — and stay an equi-join plan."""
    from boostdb_spark.operators.joins import interval_overlap_join

    hour = 3600 * 1_000_000_000
    e = _events_x(spark, 4)
    ns = F.col("ts").cast("long") if dict(e.dtypes)["ts"] in ("bigint", "long") else None
    from boostdb_spark.functions.scalar import ts_ns

    e = e.withColumn("tns", ts_ns(e, "ts"))
    left = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("lid"), "user_id",
        F.col("tns").alias("s"), (F.col("tns") + 2 * hour).alias("e"),
    )
    right = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("rid"), "user_id",
        F.col("tns").alias("s"), (F.col("tns") + hour).alias("e"),
    )
    binned = interval_overlap_join(
        left, right, on=["user_id"], bucket=hour,
        left_range=("s", "e"), right_range=("s", "e"),
        pair_key=["lid", "rid"],
    ).select("lid", "rid")
    naive = left.join(
        right.withColumnRenamed("s", "rs").withColumnRenamed("e", "re"),
        (left["user_id"] == right["user_id"]),
    ).filter((F.col("s") <= F.col("re")) & (F.col("rs") <= F.col("e"))).select(
        "lid", "rid"
    )
    assert binned.exceptAll(naive).count() == 0
    assert naive.exceptAll(binned).count() == 0
    p = binned._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p


def test_cap_per_group_heavy_skew_deterministic(spark):
    """One group with ~2M rows: the cap returns exactly `cap` rows for
    it, and the kept set is partitioning-invariant."""
    from boostdb_spark.operators.sampling import cap_per_group

    big = spark.range(2_000_000).select(
        F.lit("hot").alias("src"), F.col("id").alias("doc_id")
    )
    small = spark.range(500).select(
        F.lit("cold").alias("src"), (F.col("id") + 10_000_000).alias("doc_id")
    )
    df = big.unionByName(small)
    out1 = cap_per_group(df, ["src"], cap=1000, key_col="doc_id")
    got1 = sorted((r["src"], r["doc_id"]) for r in out1.collect())
    got2 = sorted(
        (r["src"], r["doc_id"])
        for r in cap_per_group(df.repartition(64), ["src"], 1000, "doc_id").collect()
    )
    assert got1 == got2
    per = {k: sum(1 for s, _ in got1 if s == k) for k in ("hot", "cold")}
    assert per == {"hot": 1000, "cold": 500}


def test_quantize_100k_vectors_partition_invariant(spark):
    from boostdb_spark.operators.similarity import quantize_int8

    e = spark.read.parquet(f"{SF01}/embeddings.parquet")
    reps = 100_000 // e.count() + 1
    big = e.crossJoin(
        F.broadcast(spark.range(reps).withColumnRenamed("id", "rep"))
    ).withColumn("vec_id", F.col("vec_id") * reps + F.col("rep")).drop("rep")
    q = quantize_int8(big).drop("q")
    a = sorted(map(tuple, q.collect()))
    b = sorted(map(tuple, quantize_int8(big.repartition(48)).drop("q").collect()))
    assert a == b and len(a) >= 100_000


def test_bpe_train_partition_invariant(spark):
    """BPE merges must be identical regardless of shuffle-partition
    count — the argmax tie-break is total, not partition-dependent."""
    from boostdb_spark.operators import bpe

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    m1 = bpe.train_bpe(docs, num_merges=8)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        m2 = bpe.train_bpe(docs.repartition(13), num_merges=8)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert m1 == m2 and len(m1) == 8


def test_snapshot_diff_2m_rows(spark):
    """CDC diff over 2M-row snapshots: one merge join, exact op counts
    known by construction (every 5th id missing from old -> insert,
    every 3rd surviving id bumped -> update, 1/11 phantoms -> delete),
    no driver materialization."""
    from boostdb_spark.operators.joins import snapshot_diff

    new = _events_x(spark, 20).select("event_id", "value")
    old = new.filter(F.col("event_id") % 5 != 0).withColumn(
        "value",
        F.col("value")
        + F.when(F.col("event_id") % 3 == 0, F.lit(1.0)).otherwise(F.lit(0.0)),
    ).unionByName(
        new.filter(F.col("event_id") % 11 == 0).select(
            (F.col("event_id") + F.lit(10**12)).alias("event_id"), "value"
        )
    )
    got = {
        r["op"]: r["n"]
        for r in snapshot_diff(old, new, ["event_id"], ["value"])
        .groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = new.count()
    assert got["insert"] == new.filter(F.col("event_id") % 5 == 0).count()
    assert got["delete"] == new.filter(F.col("event_id") % 11 == 0).count()
    assert got["update"] == new.filter(
        (F.col("event_id") % 5 != 0) & (F.col("event_id") % 3 == 0)
    ).count()
    assert n == 2_000_000


def test_rollup_cascade_2m_rows_levels_consistent(spark):
    """Cascade over 2M rows: coarser levels must re-aggregate the
    finest exactly — per-level row counts nest and the global (n,
    total) is identical at every resolution (a partial-aggregation
    bug double-counts or drops at a boundary)."""
    raw = _events_x(spark, 20)
    from boostdb_spark.functions.scalar import ts_ns

    df = raw.select(
        "event_type", ts_ns(raw, "ts").alias("ts"), "value"
    )
    out = ts_ops.rollup_cascade(
        df, (3600, 21600, 86400), keys=("event_type",)
    ).localCheckpoint(eager=True)
    per_level = {
        r["level_s"]: (r["rows"], r["n_sum"], float(r["t_sum"]))
        for r in out.groupBy("level_s").agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n").alias("n_sum"),
            F.sum("total").alias("t_sum"),
        ).collect()
    }
    assert per_level[3600][0] >= per_level[21600][0] >= per_level[86400][0]
    totals = {lv: (ns, ts) for lv, (_r, ns, ts) in per_level.items()}
    assert totals[3600] == totals[21600] == totals[86400]
    assert per_level[3600][1] == 2_000_000


def test_semantic_dedup_8k_vectors_invariants(spark):
    """SemDeDup at 4x the sf0.1 embedding corpus (8k vecs, 32
    clusters): the kept set is tau-independent within clusters, every
    dropped row has a tau-neighbor, exact duplicates collapse to one
    survivor each, and the result is partition-invariant."""
    from boostdb_spark.operators.dedup import semantic_dedup
    from boostdb_spark.operators import similarity as sim

    e = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n = e.count()
    big = (
        e.crossJoin(F.broadcast(spark.range(4).withColumnRenamed("id", "rep")))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * n)
        .drop("rep", "label")
    )  # 4 exact copies of every vector under distinct ids
    tau = 0.4
    sd = semantic_dedup(big, tau=tau, n_clusters=32, n_iter=2)
    sd = sd.localCheckpoint(eager=True)
    assert sd.count() == 4 * n
    kept = sd.filter("kept")
    # exact duplicates (cos == 1) can never survive together, so the
    # kept set is at most one per original vector
    assert kept.count() <= n
    # invariant recheck by independent pair join
    l = kept.select("cluster", F.col("vec_id").alias("a"), F.col("v").alias("av"))
    r = kept.select("cluster", F.col("vec_id").alias("b"), F.col("v").alias("bv"))
    viol = (
        l.join(r, "cluster")
        .filter(F.col("a") != F.col("b"))
        .withColumn("cos", sim.fold_dot(F.col("av"), F.col("bv")))
        .filter(F.col("cos") >= tau)
        .count()
    )
    assert viol == 0
    # partition invariance of the kept id set
    sd2 = semantic_dedup(big.repartition(13), tau=tau, n_clusters=32, n_iter=2)
    ids1 = {r["vec_id"] for r in kept.select("vec_id").collect()}
    ids2 = {r["vec_id"] for r in sd2.filter("kept").select("vec_id").collect()}
    assert ids1 == ids2


def test_substring_spans_100k_docs_planted(spark):
    """Substring dedup at 100k docs: replicate the documents corpus
    40x with per-copy token rotation (so copies share few shingles),
    plant ONE known 30-token verbatim run in two far-apart docs, and
    assert the planted span (and only spans >= threshold) surfaces —
    bucketed candidate generation must not blow up quadratically."""
    d = spark.read.parquet(f"{SF01}/documents.parquet").select("doc_id", "text")
    n = d.count()
    big = (
        d.crossJoin(F.broadcast(spark.range(40).withColumnRenamed("id", "rep")))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
        # rotate text at a copy-dependent split: copies are not dups
        .withColumn(
            "text",
            F.expr(
                "concat(substring(text, CAST(rep * 31 % greatest(length(text), 1) AS INT) + 1), ' ', "
                "substring(text, 1, CAST(rep * 31 % greatest(length(text), 1) AS INT)))"
            ),
        )
        .drop("rep")
    )
    planted = " ".join(f"plantedtok{i}" for i in range(30))
    extra = spark.createDataFrame(
        [
            (10_000_001, f"prefix words here {planted} and a suffix"),
            (10_000_002, f"{planted} entirely different tail content"),
        ],
        "doc_id long, text string",
    )
    big = big.unionByName(extra)
    out = dd.substring_spans(big, k=8, min_span=25, max_doc_freq=200)
    rows = out.filter(
        (F.col("doc_a") == 10_000_001) | (F.col("doc_b") == 10_000_001)
        | (F.col("doc_a") == 10_000_002) | (F.col("doc_b") == 10_000_002)
    ).collect()
    assert any(
        r.doc_a == 10_000_001 and r.doc_b == 10_000_002
        and r.span_tokens == 30
        for r in rows
    ), f"planted 30-token span must surface, got {rows[:5]}"


def test_ann_append_equals_rebuild_20k_vectors(spark):
    """Incremental ANN maintenance at 20k vectors: append-only
    assignment against a quantizer trained on the first half must
    equal the full rebuild row-for-row (the certificate invariant at
    10x the fixture)."""
    from boostdb_spark.operators import similarity as sim

    e = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n = e.count()
    dim = len(e.select("embedding").first()[0])
    big = (
        e.crossJoin(F.broadcast(spark.range(10).withColumnRenamed("id", "rep")))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * n)
        .withColumn(
            "embedding",
            F.expr(
                f"concat(slice(embedding, CAST(rep % {dim} AS INT) + 1, "
                f"{dim} - CAST(rep % {dim} AS INT)), "
                f"slice(embedding, 1, CAST(rep % {dim} AS INT)))"
            ),
        )
        .drop("rep")
    )
    cut = n * 5
    train = big.filter(F.col("vec_id") < cut)
    new = big.filter(F.col("vec_id") >= cut)
    cents = sim.ivf_train_kmeans(train, n_centroids=16, n_iter=2)
    full = sim.ivf_build_index(big, cents)
    merged = sim.ivf_build_index(train, cents).unionByName(
        sim.ivf_append_index(new, cents)
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0
