"""Scale-up evidence for the round-4 document plans (SCALE.md).

Generates a deterministic 50,000-doc corpus (10x the sf0.1 documents
table: ~18-token docs from a 2000-word vocab, 5 langs x 20 sources,
every 20th doc exactly duplicated by its successor — planted dup
pairs) to /tmp/scale50k/documents.parquet, then runs the REGISTERED
query plans against it.

Run: python scripts/scale_docs.py   (prints a markdown table)
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

N = 50_000
OUT = "/tmp/scale50k"

QUERIES_TO_RUN = [
    "x102_temperature_mixture",
    "x103_quality_calibration",
    "x108_bigram_logprob",
    "x112_quota_sample",
    "x111_source_overlap_matrix",
    "x104_canonical_dedup",
    "x105_leakage_safe_split",
]


def generate(spark) -> None:
    base = spark.range(N).withColumnRenamed("id", "doc_id")
    # every 20th doc and its successor share a seed -> exact dup pairs
    seed = F.when(
        F.col("doc_id") % 20 == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    words = [
        F.concat(
            F.lit("w"),
            (
                F.abs(F.xxhash64(seed.cast("bigint"), F.lit(i))) % 2000
            ).cast("string"),
        )
        for i in range(18)
    ]
    text = F.concat_ws(" ", *words)
    h = F.abs(F.xxhash64("doc_id", F.lit("meta")))
    langs = F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "zh")])
    docs = base.select(
        "doc_id",
        text.alias("text"),
        F.element_at(langs, (h % 5 + 1).cast("int")).alias("lang"),
        F.concat(F.lit("src"), (h % 20).cast("string")).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")


def main() -> None:
    from azure_serverless_etl_pipeline_spark.plans.queries import QUERIES

    spark = get_spark(app_name="scale_docs", shuffle_partitions=64)
    t0 = time.time()
    generate(spark)
    print(f"generate + write {N:,} docs: {time.time() - t0:.1f}s\n")
    print("| plan | rows out | sec @ 50k docs |")
    print("|---|---|---|")
    for name in QUERIES_TO_RUN:
        spark.catalog.clearCache()
        t0 = time.time()
        n_out = QUERIES[name](spark, OUT).count()
        print(f"| {name} | {n_out:,} | {time.time() - t0:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
