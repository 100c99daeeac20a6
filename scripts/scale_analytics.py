"""Scale-up evidence for the round-4 analytics plans (SCALE.md).

Generates a deterministic 10,000,000-row events table (100x the sf0.1
bench table: 50k users, 30 days, 5 event types; xxhash64-derived, no
RNG) to /tmp/scale10m/events.parquet, then runs the REGISTERED query
plans (plans/queries.py — the same code the driver checks) against it.
The claim under test: each plan is a one-or-two-shuffle pipeline whose
cost is dominated by scan + partial aggregation, so 100x data on fixed
cores costs far less than 100x time.

Run: python scripts/scale_analytics.py   (prints a markdown table)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from azure_serverless_etl_pipeline_spark.session import get_spark  # noqa: E402

N = 10_000_000
USERS = 50_000
DAYS = 30
OUT = "/tmp/scale10m"

QUERIES_TO_RUN = [
    "x106_count_anomaly",
    "x107_seasonality_index",
    "x109_session_paths",
    "x101_cohort_retention",
    "x95_event_transitions",
    "x88_session_concurrency",
]


def generate(spark) -> None:
    base = spark.range(N).withColumnRenamed("id", "event_id")
    h = F.abs(F.xxhash64("event_id"))
    h2 = F.abs(F.xxhash64("event_id", F.lit(1)))
    types = F.array(*[F.lit(t) for t in ("view", "click", "signup", "purchase", "refund")])
    ev = base.select(
        "event_id",
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_dt_interval(days=F.lit(0), hours=F.lit(0), mins=F.lit(0),
                                 secs=(h % (DAYS * 86400)).cast("double"))
        ).alias("ts"),
        (h2 % USERS).alias("user_id"),
        F.element_at(types, (h % 5 + 1).cast("int")).alias("event_type"),
        ((h2 % 10_000) / 100.0).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    ev.write.mode("overwrite").parquet(f"{OUT}/events.parquet")


def main() -> None:
    from azure_serverless_etl_pipeline_spark.plans.queries import QUERIES

    spark = get_spark(app_name="scale_analytics", shuffle_partitions=64)
    t0 = time.time()
    generate(spark)
    gen_s = time.time() - t0
    print(f"generate + write {N:,} rows: {gen_s:.1f}s\n")
    print("| plan | rows out | sec @ 10M |")
    print("|---|---|---|")
    for name in QUERIES_TO_RUN:
        spark.catalog.clearCache()
        t0 = time.time()
        df = QUERIES[name](spark, OUT)
        n_out = df.count()
        dt = time.time() - t0
        print(f"| {name} | {n_out:,} | {dt:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
