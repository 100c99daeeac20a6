#!/usr/bin/env python
"""Round-11 definitive-bench analysis: BENCH_local_r11_noop.json vs
STANDING.json (the 2x bar) and vs BENCH_local_r10_noop.json on the
common queries (the drift-independent cross-round check)."""

from __future__ import annotations

import json
import statistics
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    cur = json.loads((REPO / "BENCH_local_r11_noop.json").read_text())
    prev = json.loads((REPO / "BENCH_local_r10_noop.json").read_text())
    standing = json.loads((REPO / "STANDING.json").read_text())["queries"]

    q, p = cur["queries"], prev["queries"]
    common = sorted(set(q) & set(p))
    ratios = [q[n] / p[n] for n in common if p[n] > 0]
    print(f"total r11: {cur['value']}s over {len(q)} queries "
          f"(r10: {prev['value']}s over {len(p)})")
    print(f"common queries: {len(common)}; median r11/r10 ratio: "
          f"{statistics.median(ratios):.3f}")
    print(f"calibration drift: {cur.get('drift')} (r10 {prev.get('drift')})")

    over = []
    for n, sec in q.items():
        st = standing.get(n)
        if st and st > 0 and sec / st > 2.0:
            over.append((n, sec, st, sec / st))
    print(f"queries over the 2x standing bar: {len(over)}")
    for n, sec, st, r in sorted(over, key=lambda t: -t[3]):
        print(f"  {n}: {sec}s vs standing {st}s = {r:.2f}x")
    worst = sorted(
        ((n, q[n], standing[n], q[n] / standing[n])
         for n in q if standing.get(n, 0) > 0),
        key=lambda t: -t[3],
    )[:6]
    print("worst vs standing:")
    for n, sec, st, r in worst:
        print(f"  {n}: {sec}s vs {st}s = {r:.2f}x")
    movers = sorted(
        ((n, p[n], q[n], q[n] / p[n]) for n in common if p[n] > 0),
        key=lambda t: -t[3],
    )[:6]
    print("worst cross-round movers:")
    for n, a, b, r in movers:
        print(f"  {n}: {a}s -> {b}s = {r:.2f}x")


if __name__ == "__main__":
    main()
