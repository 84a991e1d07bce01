"""sf1 scale-curve probe (VERDICT r6 ask #8): materialize a 10x-row
scale-up of the sf0.1 fixtures and wall-time the most expensive
non-streaming suite entries at both scales.

Why this exists: the driver benches at sf0.1 only, so a hidden
machinery floor (an operator whose wall is constant-ish at small SF
but super-linear in rows) is invisible. Ratios ~10x on a 10x row
count say "data-dominated, scales linearly"; ratios near 1x say
"machinery floor, the sf0.1 number is overhead"; ratios >> 10x are
the red flags this probe hunts. This is the cheapest 100x-scale
evidence available in a local[32] sandbox.

The sf1 tables are derived from sf0.1 with DETERMINISTIC 10-copy
replication (this is a PERFORMANCE fixture, not a correctness one —
correctness stays on the driver-generated parquet per TESTDATA.md):

- events: event_id/user_id offset per copy (10x devices over the
  same retention window — per-series row count grows 10x).
- documents: doc_id offset; text ROTATED at a copy-dependent split
  point so copies are not verbatim/near duplicates of each other
  (a naive 10-copy corpus would give every doc 9 exact dups and
  quadratic pair blowups no real sf1 corpus has).
- embeddings: vec_id offset; vector components rotated by the copy
  index (norm-preserving, decorrelates copies).
- lineitem/orders/customer: join keys offset consistently so the
  TPC-H join shapes still match; part/supplier/nation/region copied
  as-is (dimension tables — 10x facts per dimension row).

Usage:
    python tools/sf1_probe.py                # build (once) + probe defaults
    python tools/sf1_probe.py entry1 entry2  # probe specific entries
Output: one line per entry `name sf0.1_s sf1_s ratio` + a summary.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get(
    "SPARK_GRAFT_SF1_DIR", str(_REPO / "spark-warehouse" / "sf1_probe")
)
COPIES = 10

#: default probe set: the most expensive non-streaming entries of the
#: r7 bench (streaming drains are data-invariant micro-batch machinery,
#: already decomposed in stream_detail) + the flagship as a floor probe
DEFAULT_ENTRIES = [
    "dedup_semantic",
    "txt_bpe_train",
    "multimodal_jpeg_color",
    "dedup_substring",
    "ann_append_certified",
    "emb_neardup_cosine",
    "dedup_minhash_lsh",
    "txt_tfidf_topk",
    "ts_seasonal_decompose",
    "agg_groupby_q1",
    "flagship_series_scan",
    # round-8 additions: the retrieval pair (stats broadcast + fusion
    # join) and the heaviest new dedup/event aggregates
    "txt_bm25_topk",
    "pipeline_hybrid_rrf",
    "dedup_containment",
    "agg_funnel",
    "ts_interp_align",
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    done = os.path.join(DST, "_BUILT")
    if os.path.exists(done):
        return
    print(f"building sf1 probe fixture at {DST} ...", file=sys.stderr)

    def copies(df, make_copy):
        out = df
        for i in range(1, COPIES):
            out = out.unionByName(make_copy(df, i))
        return out

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(DST, f"{name}.parquet"))
        print(f"  {name}: {df.count()} rows", file=sys.stderr)

    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    e_off = ev.agg(F.max("event_id")).collect()[0][0] + 1
    u_off = ev.agg(F.max("user_id")).collect()[0][0] + 1
    write(
        copies(
            ev,
            lambda d, i: d.withColumn("event_id", F.col("event_id") + i * e_off)
            .withColumn("user_id", F.col("user_id") + i * u_off),
        ),
        "events",
    )

    doc = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    d_off = doc.agg(F.max("doc_id")).collect()[0][0] + 1

    def doc_copy(d, i):
        # rotate the text at a copy-dependent split so copies are not
        # verbatim/near duplicates (37i mod len is content-dependent)
        pos = (F.lit(37 * i) % F.greatest(F.length("text"), F.lit(1))) + 1
        rotated = F.concat(
            F.expr(f"substring(text, {37 * i} % greatest(length(text), 1) + 1)"),
            F.lit(" "),
            F.substring(F.col("text"), 1, (pos - 1).cast("int")),
        )
        return d.withColumn("doc_id", F.col("doc_id") + i * d_off).withColumn(
            "text", rotated
        )

    write(copies(doc, doc_copy), "documents")

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    v_off = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])

    def emb_copy(d, i):
        k = i % dim
        rot = F.concat(
            F.slice("embedding", k + 1, dim - k), F.slice("embedding", 1, k)
        )
        return d.withColumn("vec_id", F.col("vec_id") + i * v_off).withColumn(
            "embedding", rot
        )

    write(copies(emb, emb_copy), "embeddings")

    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    ords = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(SRC, "customer.parquet"))
    ok_off = ords.agg(F.max("o_orderkey")).collect()[0][0] + 1
    ck_off = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    write(
        copies(
            li,
            lambda d, i: d.withColumn(
                "l_orderkey", F.col("l_orderkey") + i * ok_off
            ),
        ),
        "lineitem",
    )
    write(
        copies(
            ords,
            lambda d, i: d.withColumn("o_orderkey", F.col("o_orderkey") + i * ok_off)
            .withColumn("o_custkey", F.col("o_custkey") + i * ck_off),
        ),
        "orders",
    )
    write(
        copies(
            cust,
            lambda d, i: d.withColumn("c_custkey", F.col("c_custkey") + i * ck_off),
        ),
        "customer",
    )
    for name in ("part", "supplier", "nation", "region"):
        p = os.path.join(SRC, f"{name}.parquet")
        if os.path.exists(p):
            write(spark.read.parquet(p), name)
    open(done, "w").write("ok\n")


def main() -> None:
    from boostdb_spark import suite
    from boostdb_spark.session import get_spark

    entries = sys.argv[1:] or DEFAULT_ENTRIES
    spark = get_spark(app_name="sf1-probe")
    build(spark)
    registry = suite.spark_queries()
    bad = [n for n in entries if n not in registry]
    assert not bad, f"unknown entries: {bad}"

    def run(name, sf_dir):
        fn = registry[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    print(f"{'entry':28s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s}")
    for name in entries:
        a = run(name, SRC)
        b = run(name, DST)
        ratio = b / a if a > 0 else float("inf")
        print(f"{name:28s} {a:8.3f} {b:8.3f} {ratio:6.2f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
