#!/usr/bin/env python
"""Summarize a pytest --durations=0 log per test and per file — the
input for assigning `slow` markers (pyproject gates the default run on
`-m 'not slow'` so the round driver's `pytest tests/ -x -q` fits its
verification budget).

Usage: python scripts/slow_report.py /tmp/pytest_full.log [threshold_sec]
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict


def main() -> int:
    path = sys.argv[1]
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    pat = re.compile(
        r"^\s*(\d+\.\d+)s\s+(call|setup|teardown)\s+(tests/[^:]+)::(\S+)"
    )
    per_test: dict[tuple[str, str], float] = defaultdict(float)
    for line in open(path):
        m = pat.match(line)
        if m:
            per_test[(m.group(3), m.group(4))] += float(m.group(1))
    per_file: dict[str, float] = defaultdict(float)
    for (f, _t), s in per_test.items():
        per_file[f] += s
    print("== per file ==")
    for f, s in sorted(per_file.items(), key=lambda kv: -kv[1]):
        print(f"{s:8.1f}s  {f}")
    print(f"\n== tests over {thr}s ==")
    tot_slow = 0.0
    for (f, t), s in sorted(per_test.items(), key=lambda kv: -kv[1]):
        if s >= thr:
            tot_slow += s
            print(f"{s:8.1f}s  {f}::{t}")
    tot = sum(per_test.values())
    print(
        f"\ntotal {tot:.0f}s across {len(per_test)} tests; "
        f"{tot_slow:.0f}s in tests >= {thr}s "
        f"(default gate would keep {tot - tot_slow:.0f}s)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
