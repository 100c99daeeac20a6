#!/usr/bin/env python
"""Full-corpus oracle sweep: EVERY registered query vs its DuckDB twin
(window + demoted) at an arbitrary scale, float-exact like the driver.
Round-5/6 evidence protocol: run at sf0.1 (10x the driver's correctness
scale) on an idle machine.

Usage: python scripts/full_oracle_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    from azure_serverless_etl_pipeline_spark.plans import (
        all_oracles_full,
        all_queries,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = all_queries(), all_oracles_full()
    bad: list[tuple[str, str]] = []
    n_checked = 0
    t0 = time.time()
    for name, fn in qs.items():
        if name not in osql:
            continue
        t1 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
            odf = con.execute(osql[name]).df()
            n_checked += 1
            if len(sdf) != len(odf):
                bad.append((name, f"rows {len(sdf)} vs {len(odf)}"))
                continue
            s = sdf[sorted(sdf.columns)].copy()
            o = odf[sorted(odf.columns)].copy()
            if list(s.columns) != list(o.columns):
                bad.append((name, f"cols {list(s.columns)} vs {list(o.columns)}"))
                continue
            s = s.sort_values(list(s.columns), ignore_index=True)
            o = o.sort_values(list(o.columns), ignore_index=True)
            for c in s.columns:
                a, b = s[c], o[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    if not np.allclose(
                        a.astype(float), b.astype(float), rtol=0, atol=0,
                        equal_nan=True,
                    ):
                        bad.append((name, f"values {c}"))
                        break
                elif not (
                    a.astype(str).to_numpy() == b.astype(str).to_numpy()
                ).all():
                    bad.append((name, f"values {c}"))
                    break
        except Exception as ex:
            bad.append((name, f"ERR {type(ex).__name__}: {str(ex)[:150]}"))
        print(f"  {name}: {time.time() - t1:.1f}s", flush=True)
    print(
        f"swept {n_checked} oracle-backed queries at {sf} "
        f"in {time.time() - t0:.0f}s; mismatches: {len(bad)}"
    )
    for n, why in bad:
        print(f"  FAIL {n}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
