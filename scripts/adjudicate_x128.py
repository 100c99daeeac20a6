#!/usr/bin/env python
"""x128 drift adjudication (VERDICT r7 item 3), x89 protocol: fresh
local[32] JVM, 10 consecutive noop-sink runs of x128_embedding_covariance
at sf0.1, then a SQL-metrics cardinality audit of the steady-state run —
either the curve converges to the standing median (warmth) or it
plateaus above it (real regression, fix the decimal-aggregation plan).

Run on an otherwise idle machine: python scripts/adjudicate_x128.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from azure_serverless_etl_pipeline_spark.plans import all_queries

    fn = all_queries()["x128_embedding_covariance"]
    samples = []
    for i in range(10):
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 2))
        print(f"run {i}: {samples[-1]}s", flush=True)
    print("curve:", samples)
    tail = sorted(samples[4:])[len(samples[4:]) // 2]
    print(f"steady-state median (runs 5-10): {tail}s")
    # cardinality audit: executed-plan metrics of one more run
    df = fn(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    print("=== executed plan (metrics) ===")
    print(plan[:8000])


if __name__ == "__main__":
    main()
