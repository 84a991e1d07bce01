"""sf10 second-decade spot probe (VERDICT r10 ask #6): the 100-TB
claim rested on ONE decade of extrapolation (sf0.1 -> sf1 ratios).
This tool adds the second decade for the heaviest non-streaming
entries: it builds a 100x-of-sf0.1 fixture (10-copy replication of the
sf1 probe fixture, same deterministic transforms) for exactly the
tables those entries touch, then wall-times each entry at sf1 AND sf10
and prints the second-decade ratio.

Reading the ratios (10x rows per decade):
  ~10  linear, the sf1 reading extrapolates — the curve holds;
  <4   machinery floor still dominating at sf1 (entry is cheap);
  >>10 super-linearity that only appears past sf1 — the red flag this
       probe exists to catch (a quadratic term small at sf1 dominates
       two decades up).

Fixture notes: events/documents/embeddings only (ts_bollinger reads
events; txt_bpe_train reads documents; dedup_semantic reads documents
+ embeddings) — probing an entry that needs other tables requires
adding them to TABLES. Replication reuses sf1_probe's copy transforms
against the sf1 fixture as source (documents rotate at copy-dependent
splits so copies are not near-duplicates; embeddings rotate
components norm-preservingly; ids offset per copy), so sf10 has the
same degenerate-duplicate-free structure as sf1.

Usage:
    python tools/sf10_probe.py                 # default three entries
    python tools/sf10_probe.py entryA entryB   # probe specific entries
Output: one line per entry `name sf1_s sf10_s ratio` + summary.

OPERATIONAL LESSON (round 11): build the fixtures and probe in
SEPARATE processes. The first r11 run built the 10M-row fixture
(hundreds of union branches analyzed, old-gen tenure from the copy
jobs) and then probed IN THE SAME JVM: dedup_semantic's first sf1 run
sat >60 min on two straggler tasks — the identical entry in a fresh
session reads ~95 s. Run the script once to build (it probes after,
slowly), or pre-build and re-run: with both _BUILT markers present
the probe session starts clean.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

import sf1_probe  # noqa: E402  (sibling tool: source fixture + builder)

SRC = sf1_probe.DST  # the sf1 fixture is this probe's SOURCE
DST = os.environ.get(
    "SPARK_GRAFT_SF10_DIR", str(_REPO / "spark-warehouse" / "sf10_probe")
)
COPIES = 10
TABLES = ("events", "documents", "embeddings")

DEFAULT_ENTRIES = [
    "dedup_semantic",
    "ts_bollinger",
    "txt_bpe_train",
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    done = os.path.join(DST, "_BUILT")
    if os.path.exists(done):
        return
    print(f"building sf10 probe fixture at {DST} ...", file=sys.stderr)

    def copies(df, make_copy):
        out = df
        for i in range(1, COPIES):
            out = out.unionByName(make_copy(df, i))
        return out

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(DST, f"{name}.parquet"))
        print(f"  {name}: {spark.read.parquet(os.path.join(DST, f'{name}.parquet')).count()} rows", file=sys.stderr)

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
        # Copy-specific coprime-stride TOKEN PERMUTATION — NOT the
        # sf1-style rotation. Round-12 finding: a rotated text keeps
        # ~all of its k-gram shingles (measured Jaccard 0.88-0.93
        # between sf1 rotation copies), so rotation copies are TRUE
        # near-duplicates and every copy family is a dedup CLIQUE —
        # pair OUTPUT then grows quadratically in the copy factor
        # (~110x per decade) and the probe measures the fixture's
        # duplicate structure, not the operator's machinery. A stride
        # permutation destroys consecutive k-grams between different
        # strides, honoring the fixture contract above; same-stride
        # copies of sf1 rotation-siblings remain near-dups, so true
        # pairs grow ~LINEARLY (10 sibling-cliques per family instead
        # of one 100-clique) — the interpretable decade curve. The
        # stride is the first of three copy-rotated odd primes not
        # dividing the token count (bijection for every realistic doc
        # length).
        toks = F.split(F.col("text"), " ")
        n = F.greatest(F.size(toks), F.lit(1))
        primes = [3, 5, 7, 11, 13, 17, 19, 23, 29]
        # fold the when-chain over ALL rotated primes: any n below
        # prod(primes) ~ 3.2e9 tokens has a coprime among nine distinct
        # primes (n has at most log_3(n) < 20 prime divisors, but only
        # 9 CAN divide it and their product bounds n), so the stride is
        # always a true bijection — a 3-prime fallback let counts
        # divisible by all three (e.g. 105) collapse the 'permutation'
        # into a short cycle
        rotated = [primes[(i + j) % len(primes)] for j in range(len(primes))]
        stride = None
        for p in rotated[:-1]:
            branch = (n % p != 0, F.lit(p))
            stride = (
                F.when(*branch) if stride is None else stride.when(*branch)
            )
        stride = stride.otherwise(F.lit(rotated[-1]))
        perm = F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda j: F.element_at(toks, ((j * stride) % n) + 1),
        )
        return d.withColumn("doc_id", F.col("doc_id") + i * d_off).withColumn(
            "text", F.array_join(perm, " ")
        )

    write(copies(doc, doc_copy), "documents")

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    v_off = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])

    def emb_copy(d, i):
        # offset the rotation past the first decade's 0..9 so copies
        # of copies stay decorrelated
        k = (11 * i) % dim
        rot = F.concat(
            F.slice("embedding", k + 1, dim - k), F.slice("embedding", 1, k)
        )
        return d.withColumn("vec_id", F.col("vec_id") + i * v_off).withColumn(
            "embedding", rot
        )

    write(copies(emb, emb_copy), "embeddings")
    open(done, "w").write("ok\n")


def main() -> None:
    from boostdb_spark import suite
    from boostdb_spark.session import get_spark

    entries = sys.argv[1:] or DEFAULT_ENTRIES
    spark = get_spark(app_name="sf10-probe")
    sf1_probe.build(spark)
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

    print(f"{'entry':28s} {'sf1':>8s} {'sf10':>8s} {'ratio':>6s}")
    for name in entries:
        a = run(name, SRC)
        b = run(name, DST)
        ratio = b / a if a > 0 else float("inf")
        print(f"{name:28s} {a:8.3f} {b:8.3f} {ratio:6.2f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
