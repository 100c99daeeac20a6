"""Skewed-corpus evidence for the ngram-Jaccard stop-shingle cap (SCALE.md).

Generates a 100k-doc corpus distributively (spark.range + hash columns)
in which 10% of docs share a boilerplate sentence — the real-corpus skew
case (site chrome, license headers) where one shingle's posting list is
f=10k docs and the uncapped inverted-index self-join must push
3*C(10k,2) ~ 1.5e8 pair-instances through the join. Plants 500 true
near-dup pairs (one-word edits, distinct bodies) to show the cap keeps
recall while removing the skew blowup.

Run: python scripts/scale_skew_dedup.py   (prints a markdown table)
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_DOCS = 100_000
PCT_BOILER = 0.10
N_PLANTED = 500
CAP = 50

BOILER = "subscribe to our newsletter for updates today"  # 7 tokens -> 5 shingles


def build_corpus(spark: SparkSession):
    """40-token docs from a 50-word vocab; deterministic via xxhash64."""
    base = spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
    words = [
        F.concat(
            F.lit("w"),
            (F.abs(F.xxhash64(F.col("doc_id"), F.lit(i))) % 50).cast("string"),
        )
        for i in range(40)
    ]
    docs = base.withColumn("text", F.concat_ws(" ", *words))
    # 10% share the boilerplate tail -> each of its shingles has df = 10k
    docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % int(1 / PCT_BOILER) == 0,
            F.concat_ws(" ", F.col("text"), F.lit(BOILER)),
        ).otherwise(F.col("text")),
    )
    # plant near-dup partners for doc_ids 1..N_PLANTED (one word changed)
    partners = (
        docs.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= N_PLANTED))
        .withColumn("doc_id", F.col("doc_id") + N_DOCS)
        .withColumn(
            "text", F.concat_ws(" ", F.lit("edited"), F.expr("substring_index(text, ' ', -39)"))
        )
    )
    return docs.unionByName(partners)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from azure_serverless_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    corpus = build_corpus(spark)
    corpus.write.mode("overwrite").parquet("/tmp/skew_corpus")
    docs = spark.read.parquet("/tmp/skew_corpus")
    n = docs.count()
    print(f"corpus: {n} docs ({PCT_BOILER:.0%} boilerplate, {N_PLANTED} planted pairs)")

    results = {}
    for label, kwargs in (
        ("uncapped", {}),
        (f"capped (max_shingle_freq={CAP})", {"max_shingle_freq": CAP}),
    ):
        t0 = time.time()
        pairs = ngram_jaccard_pairs(docs, threshold=0.5, **kwargs)
        got = pairs.filter(
            (F.col("id_b") - F.col("id_a") == N_DOCS) & (F.col("id_a") <= N_PLANTED)
        ).count()
        total = pairs.count()
        dt = time.time() - t0
        results[label] = (dt, total, got)
        print(f"{label}: {dt:.1f}s total_pairs={total} planted_recall={got}/{N_PLANTED}")
        spark.catalog.clearCache()

    print("\n| variant | sec | pairs out | planted recall |")
    print("|---|---|---|---|")
    for label, (dt, total, got) in results.items():
        print(f"| {label} | {dt:.1f} | {total} | {got}/{N_PLANTED} |")


if __name__ == "__main__":
    main()
