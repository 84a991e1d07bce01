"""Python-boundary plan sweep (round 14, optimization guide §4.4):
two failure patterns that silently multiply JVM<->Python crossings —

1. DUPLICATED UDF evaluation: the optimizer pushes a filter that
   references a UDF-computed column below the projection that computes
   it, evaluating the UDF twice (two ArrowEvalPython/BatchEvalPython
   nodes carrying the SAME udf expression). Guide §4.4; the fix is
   .asNondeterministic() on the expensive UDF, or restructuring so the
   filter consumes the materialized column.
2. ROW-AT-A-TIME pickling: any BatchEvalPython node at all — this
   engine's contract is Arrow-batched crossings only (pandas UDFs /
   mapInPandas / mapInArrow); a plain @F.udf sneaking in regresses the
   boundary to pickled rows.

Scans EVERY suite entry's formatted plan and prints offenders.

TRIAGE REQUIRED: a "duplicated" flag compares udf-signature strings with
expression ids stripped, so it also fires on legitimate repeated
subtrees — the same UDF applied to both sides of a self-join
(dedup_substring's shingles), or a certificate evaluating one pipeline
per leg. Read the flagged plan before concluding §4.4: the true
duplication signature is two nodes with IDENTICAL inputs in one linear
chain, separated by a Filter/Generate that the optimizer pushed below
the computing projection (r14 true positives: cosine_range_search's tau
filter, the PQ adist / LSH buckets posexplode inferred filters).

Usage:
    python tools/python_eval_sweep.py
Output: one line per offender; a `--` summary line at the end.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def python_eval_nodes(df) -> list[tuple[str, str]]:
    """(node_kind, udf_signature) per Python-eval node in the plan.
    The signature strips expression ids so two evaluations of the same
    UDF over the same inputs compare equal."""
    spark = df.sparkSession
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    out = []
    for seg in p.split("\n\n"):
        lines = seg.strip().splitlines()
        if not lines or not lines[0].startswith("("):
            continue
        m = re.match(r"\(\d+\) (ArrowEvalPython|BatchEvalPython)", lines[0])
        if not m:
            continue
        args = " ".join(
            ln for ln in lines if ln.startswith("Arguments:")
        )
        sig = re.sub(r"#\d+[L]?", "#", args)
        out.append((m.group(1), sig))
    return out


def main() -> None:
    from boostdb_spark import suite
    from boostdb_spark.session import get_spark

    sf_dir = str(_REPO.parent / "testdata" / "sf0.001")
    spark = get_spark(app_name="python-eval-sweep")
    n_flagged = 0
    for name, fn in suite.spark_queries().items():
        try:
            nodes = python_eval_nodes(fn(spark, sf_dir))
        except Exception as exc:  # entry needs tables the dir lacks, etc.
            print(f"{name}: ERR {type(exc).__name__}", file=sys.stderr)
            continue
        batch = [k for k, _ in nodes if k == "BatchEvalPython"]
        sigs = [s for k, s in nodes]
        dups = {s for s in sigs if sigs.count(s) > 1}
        if batch:
            print(f"{name}: {len(batch)} BatchEvalPython (pickled rows)")
            n_flagged += 1
        if dups:
            print(
                f"{name}: duplicated python-eval x{len(dups)} "
                f"({len(nodes)} nodes total)"
            )
            n_flagged += 1
    print(f"-- {n_flagged} offenders", flush=True)


if __name__ == "__main__":
    main()
