"""Round-close checklist (r12-verdict ask #3): every record artifact a
round's CHANGELOG section claims must actually exist in git at close.

The r12 CHANGELOG said a core-tier record was "committed alongside the
full record" while `git ls-files` had neither — the exact record-drift
this check makes mechanical. Run before the end-of-round commit:

    python tools/close_checklist.py [round_number]

Scans the LATEST (or given) round's CHANGELOG section for tokens that
look like record files (BENCH*/CORRECTNESS*/BASELINE*/*.json) and
fails loudly on any that `git ls-files` does not track.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]


def section_for(text: str, rnd: int | None) -> tuple[int, str]:
    heads = [
        (m.start(), int(m.group(1)))
        for m in re.finditer(r"^## Round (\d+)", text, re.M)
    ]
    assert heads, "no '## Round N' sections in CHANGELOG.md"
    if rnd is None:
        rnd = max(n for _, n in heads)
    starts = [pos for pos, n in heads if n == rnd]
    assert starts, f"no CHANGELOG section for round {rnd}"
    start = starts[0]
    after = [pos for pos, _ in heads if pos > start]
    return rnd, text[start: min(after) if after else len(text)]


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    text = (_REPO / "CHANGELOG.md").read_text()
    rnd, sec = section_for(text, rnd)
    claimed = set(
        re.findall(r"\b((?:BENCH|CORRECTNESS)[A-Za-z0-9_.-]*\.json)\b", sec)
    )
    tracked = set(
        subprocess.run(
            ["git", "ls-files"], cwd=_REPO, capture_output=True, text=True,
            check=True,
        ).stdout.split()
    )
    missing = sorted(n for n in claimed if n not in tracked)
    print(f"round {rnd}: {len(claimed)} record file(s) named in CHANGELOG")
    for n in sorted(claimed):
        print(f"  {'OK     ' if n in tracked else 'MISSING'} {n}")
    if missing:
        print(f"FAIL: {missing} claimed but not tracked — commit them "
              "or fix the CHANGELOG before close")
        sys.exit(1)
    print("close checklist: PASS")


if __name__ == "__main__":
    main()
