"""Window-buffer duplication sweep (round 14): Spark does NOT dedup
window aggregate expressions when building the physical Window node —
deriving N output columns inline from shared frame aggregates embeds a
COPY of each aggregate per use, and every copy is a separate sliding
buffer evaluated per row. The r14 decomposition found ts_bollinger
running 13 sliding decimal buffers where the semantics need 3 (5.0 s
vs 1.7 s at sf0.1) and ts_zscore_anomaly running 17.

This tool scans EVERY suite entry's formatted plan and prints the
entries whose Window nodes carry >= --min-buffers (default 5)
aggregates, so the duplication pattern cannot silently return as new
window-family operators land. The fix is always the same two-stage
projection: materialize the frame totals once, derive outputs from
plain columns (bit-identical values; see
operators/timeseries.py::bollinger_bands for the canonical shape, and
tests/test_plan_shapes.py for the pinned buffer counts).

Usage:
    python tools/window_buffer_sweep.py [--min-buffers N]
Output: `max_buffers entry [per-node counts]`, worst first.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def window_buffer_counts(df) -> list[int]:
    """Per-Window-node aggregate-buffer counts from the formatted plan."""
    spark = df.sparkSession
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    counts = []
    for seg in p.split("\n\n"):
        lines = seg.strip().splitlines()
        if not (
            lines
            and lines[0].startswith("(")
            and lines[0].rstrip().endswith("Window")
        ):
            continue
        args = "\n".join(
            ln for ln in seg.splitlines() if ln.startswith("Arguments:")
        )
        counts.append(len(re.findall(r"windowspecdefinition", args)))
    return counts


def main() -> None:
    from boostdb_spark import suite
    from boostdb_spark.session import get_spark

    min_buffers = 5
    if "--min-buffers" in sys.argv:
        min_buffers = int(sys.argv[sys.argv.index("--min-buffers") + 1])
    sf_dir = str(_REPO.parent / "testdata" / "sf0.001")
    spark = get_spark(app_name="window-buffer-sweep")
    rows = []
    for name, fn in suite.spark_queries().items():
        try:
            counts = window_buffer_counts(fn(spark, sf_dir))
        except Exception as exc:  # entry needs tables the dir lacks, etc.
            print(f"{name}: ERR {type(exc).__name__}", file=sys.stderr)
            continue
        if counts and max(counts) >= min_buffers:
            rows.append((max(counts), name, counts))
    for c, name, counts in sorted(rows, reverse=True):
        print(f"{c:3d} {name} {counts}")
    print(f"-- {len(rows)} entries at >= {min_buffers} buffers", flush=True)


if __name__ == "__main__":
    main()
