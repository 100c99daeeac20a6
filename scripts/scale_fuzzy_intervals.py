"""Scale-up evidence for the round-4 join operators (SCALE.md).

1. fuzzy_pairs (x89): a synthetic corpus with planted char-level
   near-dups, measured at 1x and 10x. The claim under test: candidate
   count (the prefix-join fan-out) and wall-clock grow FAR slower than
   the n^2 comparison space, because candidates are generated only from
   each doc's d*q+1 rarest gram occurrences.
2. interval_overlap_pairs (x88): synthetic session intervals at 1x and
   10x over the SAME time span (so density, and therefore the true
   overlap count, grows ~100x). The claim: runtime tracks the OUTPUT
   size (true pairs), not the |A|x|B| nested-loop space — the bin
   equi-join is doing the work.

Deterministic (xxhash64-derived data, no RNG state).
Run: python scripts/scale_fuzzy_intervals.py   (prints a markdown table)
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
from azure_serverless_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs  # noqa: E402
from azure_serverless_etl_pipeline_spark.operators.intervals import (  # noqa: E402
    interval_overlap_pairs,
)


def fuzzy_corpus(spark, n_docs: int):
    """~120-char keys from a 2000-word vocab; every 20th doc is a 2-edit
    mutation of its predecessor (planted true pairs)."""
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    words = [
        F.concat(
            F.lit("w"),
            (F.abs(F.xxhash64((F.col("doc_id") / 20).cast("bigint"), F.lit(i))) % 2000).cast("string"),
        )
        for i in range(18)
    ]
    text = F.concat_ws(" ", *words)
    # mutate non-representative clones: flip two chars via suffix tag
    is_clone = (F.col("doc_id") % 20) != 0
    mutated = F.concat(
        F.substring(text, 1, 40),
        F.when(is_clone, (F.col("doc_id") % 7).cast("string")).otherwise(F.lit("x")),
        F.substring(text, 42, 200),
    )
    return base.select("doc_id", mutated.alias("text"))


def interval_set(spark, n: int, span_hours: int = 24 * 30):
    """n intervals over a fixed 30-day span; width 10-70 min."""
    us = 1_000_000
    base = spark.range(n).withColumnRenamed("id", "iid")
    start = (F.abs(F.xxhash64(F.col("iid"), F.lit(1))) % (span_hours * 3600 * us)).cast(
        "bigint"
    )
    width = ((F.abs(F.xxhash64(F.col("iid"), F.lit(2))) % (60 * 60 * us)) + 10 * 60 * us).cast("bigint")
    return base.select(
        F.lit(0).alias("user_id").cast("bigint"),
        F.col("iid").alias("session_id"),
        start.alias("start_us"),
        (start + width).alias("end_us"),
    )


def main() -> None:
    spark = get_spark(app_name="scale_fuzzy_intervals")
    print("| experiment | n | output pairs | wall s |")
    print("|---|---|---|---|")
    for n in (5_000, 50_000):
        docs = fuzzy_corpus(spark, n)
        t0 = time.perf_counter()
        cnt = fuzzy_pairs(docs, max_dist=3, q=10, key_len=64).count()
        dt = time.perf_counter() - t0
        print(f"| fuzzy_pairs | {n} | {cnt} | {dt:.2f} |")
        spark.catalog.clearCache()
    for n in (10_000, 100_000):
        iv = interval_set(spark, n)
        t0 = time.perf_counter()
        cnt = interval_overlap_pairs(
            iv, bin_minutes=60, id_cols=("user_id", "session_id")
        ).count()
        dt = time.perf_counter() - t0
        print(f"| interval_overlap | {n} | {cnt} | {dt:.2f} |")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
