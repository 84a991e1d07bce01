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

ROUND-15 TRIAGE LEDGER (every current flag read and adjudicated; a new
flag not on this list is untriaged and must be read before the next
close):
- ann_range_certified: WAS a true §4.4 positive — ivf_range_search's
  tau filter re-evaluated the scoring fold below the projection in
  BOTH certificate legs (ArrowEvalPython/Filter/ArrowEvalPython,
  identical inputs). FIXED r15: fold_dot(once=True) through
  _ivf_scored (plans/r15/ann_range_certified_{before,after}.txt,
  4 -> 2 fold nodes). The residual x2 flags are the approx-vs-full
  legs (n_probe 4 vs 16 — different computations, id-stripped
  signatures collide): legitimate.
- ann_append_certified x3: probe/drift legs over DIFFERENT slices
  (train vs append) or parquet-backed sides — no corpus subtree
  executes twice (r14 triage, plan unchanged r15): legitimate.
- emb_mmr_rerank x1 / emb_abtt_certified x1: certificate legs re-score
  pool-bounded frames (pool x k x 5 queries) in separate subtrees —
  bounded work, not corpus-proportional: legitimate.
- dedup_substring(_clean) / txt_ngram_novelty x1: the positioned-
  shingle UDF on both sides of a self-join; the checkpoint-the-
  shingles alternative was MEASURED in r14 (~15% local win) and
  rejected — it materializes ~10x the text through disk, inverting at
  scale: legitimate as-shipped.
- udtf_tokenize 1 BatchEvalPython: the UDTF surface itself (eval is
  per-row by Spark's contract; the high-volume path is mapInPandas):
  legitimate.
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


def duplicated_signatures(nodes: list[tuple[str, str]]) -> set[str]:
    """Signatures appearing on 2+ Python-eval nodes. Nodes whose plan
    section carried no ``Arguments:`` line have an EMPTY signature —
    two such unrelated nodes would compare equal, so they are excluded
    from dup detection (r14 advisor catch) and surfaced separately by
    main() instead."""
    sigs = [s for _k, s in nodes if s]
    return {s for s in sigs if sigs.count(s) > 1}


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
        dups = duplicated_signatures(nodes)
        unsigned = sum(1 for _k, s in nodes if not s)
        if batch:
            print(f"{name}: {len(batch)} BatchEvalPython (pickled rows)")
            n_flagged += 1
        if dups:
            print(
                f"{name}: duplicated python-eval x{len(dups)} "
                f"({len(nodes)} nodes total)"
            )
            n_flagged += 1
        if unsigned:
            print(
                f"{name}: {unsigned} python-eval node(s) without an "
                "Arguments: line (signature unavailable; read the plan)"
            )
            n_flagged += 1
    print(f"-- {n_flagged} offenders", flush=True)


if __name__ == "__main__":
    main()
