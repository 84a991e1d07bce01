"""Partition-count invariance sweep: run every oracle-paired query at
two different spark.sql.shuffle.partitions settings and require
bit-identical results.

Partition-dependent nondeterminism (unordered collect_list folds,
row_number ties without full tiebreaks, partial-agg float reassociation)
is invisible to the single-configuration oracle gate but WILL flip the
driver's hash when its cluster layout differs. Run before shipping:

    python tools/invariance_check.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from boostdb_spark import suite  # noqa: E402
from boostdb_spark.session import get_spark  # noqa: E402
from boostdb_spark.verify import compare  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="invariance-check")
    qs = suite.spark_queries()
    bad = []
    names = list(suite.oracle_queries())
    for i, name in enumerate(names):
        fn = qs[name]
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = fn(spark, sf).toPandas()
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = fn(spark, sf).toPandas()
        problems = compare(a, b)
        if problems:
            bad.append(name)
            print(f"MISMATCH {name}: {problems[:2]}", flush=True)
        if i % 20 == 0:
            print(f"... {i}/{len(names)} {name}", file=sys.stderr, flush=True)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    print(f"checked {len(names)} queries; mismatches: {len(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
