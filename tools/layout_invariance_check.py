"""Input-layout invariance sweep: rewrite every fixture table with a
different file count and destroyed row order, then require every
oracle-paired query to return bit-identical results on the copy.

Catches layout-dependent nondeterminism the fixed fixtures hide:
first/last without full ordering, folds over collect_list of
differently-ordered partitions, anything keyed off file split order.
At 100 TB the layout is never the one you tested on.

    python tools/layout_invariance_check.py [src_sf_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from boostdb_spark import suite  # noqa: E402
from boostdb_spark.session import TESTDATA_TABLES, get_spark  # noqa: E402
from boostdb_spark.verify import compare  # noqa: E402


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = "/tmp/boostdb_layout_check"
    spark = get_spark(app_name="layout-invariance")
    os.makedirs(dst, exist_ok=True)
    for t in TESTDATA_TABLES:
        p = f"{src}/{t}.parquet"
        if not os.path.exists(p):
            continue
        df = spark.read.parquet(p)
        df.repartition(13, F.xxhash64(*df.columns[:1])).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    qs = suite.spark_queries()
    names = list(suite.oracle_queries())
    bad = []
    for i, name in enumerate(names):
        a = qs[name](spark, src).toPandas()
        b = qs[name](spark, dst).toPandas()
        problems = compare(a, b)
        if problems:
            bad.append(name)
            print(f"MISMATCH {name}: {problems[:2]}", flush=True)
        if i % 20 == 0:
            print(f"... {i}/{len(names)} {name}", file=sys.stderr, flush=True)
    print(f"checked {len(names)}; layout-dependent mismatches: {len(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
