"""Interleaved A/B probe for ONE suite entry across two checkouts.

Usage: python tools/ab_entry.py <repo_dir> <entry> [<entry> ...]

Runs in a FRESH process per invocation (the caller interleaves
invocations across checkouts — the bd9bbbc host-noise methodology):
imports the suite from <repo_dir>, measures the fixed machine canary
(same arithmetic as bench.py's _calibration), runs the entry once
UNTIMED (the warmup/layout-build the bench amortizes in WARMUP), then
times a second full materialization through the noop sink. One JSON
line per entry on stdout — walls are comparable across processes at
matched canary.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = sys.argv[1]
    entries = sys.argv[2:]
    sys.path.insert(0, repo)
    from boostdb_spark import suite
    from boostdb_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-entry")
    reg = suite.spark_queries()

    t0 = time.perf_counter()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(id * 7 % 1000)"
    ).collect()
    jvm = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = 0
    for i in range(5_000_000):
        x += i * 31 % 97
    py = time.perf_counter() - t0
    t0 = time.perf_counter()
    spark.range(0, 2_000_000, 1, 32).selectExpr(
        "id % 10000 AS k", "id AS v"
    ).groupBy("k").sum("v").selectExpr("sum(`sum(v)`)").collect()
    sh = time.perf_counter() - t0

    for name in entries:
        fn = reg[name]
        t0 = time.perf_counter()
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        timed = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "repo": os.path.basename(repo.rstrip("/")),
                    "entry": name,
                    "jvm": round(jvm, 3),
                    "py": round(py, 3),
                    "shuffle": round(sh, 3),
                    "warm_s": round(warm, 3),
                    "timed_s": round(timed, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
