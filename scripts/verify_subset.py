#!/usr/bin/env python
"""Oracle-check a subset of registered queries (full registry, window +
demoted oracles via all_oracles_full) at a given scale — the round-13
per-change verification loop.

Usage: python scripts/verify_subset.py name1,name2,... [sf_dir]
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
    names = sys.argv[1].split(",")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from azure_serverless_etl_pipeline_spark.plans import all_queries
    from azure_serverless_etl_pipeline_spark.plans.oracles import (
        all_oracles_full,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = all_queries(), all_oracles_full()
    bad = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf).toPandas()
            if name not in osql:
                print(f"  rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
                continue
            odf = con.execute(osql[name]).df()
            status = "MATCH"
            if len(sdf) != len(odf):
                status = f"ROWS {len(sdf)} vs {len(odf)}"
            else:
                s = sdf[sorted(sdf.columns)].copy()
                o = odf[sorted(odf.columns)].copy()
                if list(s.columns) != list(o.columns):
                    status = f"COLS {list(s.columns)} vs {list(o.columns)}"
                else:
                    s = s.sort_values(list(s.columns), ignore_index=True)
                    o = o.sort_values(list(o.columns), ignore_index=True)
                    for c in s.columns:
                        a, b = s[c], o[c]
                        if a.dtype.kind == "f" or b.dtype.kind == "f":
                            if not np.allclose(
                                a.astype(float), b.astype(float),
                                rtol=0, atol=0, equal_nan=True,
                            ):
                                status = f"VALUES {c}"
                                break
                        elif not (
                            a.astype(str).to_numpy() == b.astype(str).to_numpy()
                        ).all():
                            status = f"VALUES {c}"
                            break
            print(f"  {status} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            if status != "MATCH":
                bad.append(name)
        except Exception as ex:
            print(f"  ERR {name}: {type(ex).__name__}: {str(ex)[:200]}")
            bad.append(name)
    print(f"{'FAIL ' + ','.join(bad) if bad else 'ALL MATCH'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
