#!/usr/bin/env python
"""Print the registry facts end-of-round summaries must quote — generated,
not hand-written, so COVERAGE.md counts cannot drift from the code
(round-4 verdict: prose said 134 while the registry held 135).

Usage: python scripts/registry_summary.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from azure_serverless_etl_pipeline_spark.plans import (
        DRIVER_WINDOW,
        all_oracles,
        all_oracles_full,
        all_queries,
    )

    queries = list(all_queries())
    oracles_full = set(all_oracles_full())
    window = list(DRIVER_WINDOW)
    window_oracles = set(all_oracles())
    rows_only_window = [n for n in window if n not in window_oracles]
    rows_only_total = [n for n in queries if n not in oracles_full]

    print(f"registry queries:        {len(queries)}")
    print(f"  with DuckDB oracle:    {len(oracles_full)}")
    print(f"  rows-only:             {len(rows_only_total)}  {sorted(rows_only_total)}")
    print(f"driver window:           {len(window)}")
    print(f"  oracle-backed slots:   {len(window_oracles)}")
    print(f"  rows-only slots:       {len(rows_only_window)}  {rows_only_window}")
    demoted = sorted(oracles_full - window_oracles)
    print(f"demoted oracles (pytest-checked at sf0.001): {len(demoted)}")

    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
            capture_output=True,
            text=True,
            timeout=300,
            cwd=Path(__file__).resolve().parents[1],
        ).stdout.strip().splitlines()
        print(f"pytest: {out[-1] if out else '?'}")
    except Exception as e:  # collection is best-effort context only
        print(f"pytest: (collection failed: {e})")


if __name__ == "__main__":
    main()
