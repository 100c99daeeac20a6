#!/usr/bin/env python
"""Per-query time breakdown for the optimization loop: construction
(driver-side setup jobs inside the query fn) vs noop-write execution,
median over N runs after one warm-up — same session config as bench.py.

Usage: python scripts/profile_query.py name1,name2,... [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from azure_serverless_etl_pipeline_spark.deploy import ship_package
    from azure_serverless_etl_pipeline_spark.plans import all_queries
    from azure_serverless_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="profile")
    ship_package(spark)
    queries = all_queries()

    for name in names:
        fn = queries[name]
        # warm-up
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        build_t, exec_t = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build_t.append(t1 - t0)
            exec_t.append(t2 - t1)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        print(
            f"{name}: build={statistics.median(build_t):.3f}s "
            f"exec={statistics.median(exec_t):.3f}s "
            f"total={statistics.median(b + e for b, e in zip(build_t, exec_t)):.3f}s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
