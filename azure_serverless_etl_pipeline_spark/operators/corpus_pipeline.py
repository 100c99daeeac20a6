"""End-to-end corpus ingest pipeline (north-star composition).

Streaming arrivals -> quality gate -> incremental dedup against the
accumulated store -> deterministic split -> partitioned append. Each
stage is an operator this engine already ships (quality rules = x46,
hash dedup = x45, split = x37); this module is the composition running
under Structured Streaming's exactly-once file source, via foreachBatch
so the dedup stage can read the accumulated store transactionally.

At 100 TB scale: the store is partitioned by split (training jobs read
one subtree), the dedup anti-join touches only the fingerprint column
(scan-pruned), and every per-batch stage is map-side except the
anti-join's hash exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import deterministic_split
from .text import STOPWORDS


def quality_gate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep docs passing the x46 composite rules (length band, alpha
    ratio, stopword presence, repetition ceiling)."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    n_tok = F.size(toks)
    alpha_ratio = F.length(
        F.regexp_replace(F.col(text_col), r"[^a-z]", "")
    ) / F.length(F.col(text_col))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(n_tok - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n_tok - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    dup_ratio = F.when(
        F.size(grams) > 0, 1 - F.size(F.array_distinct(grams)) / F.size(grams)
    ).otherwise(F.lit(0.0))
    return docs.filter(
        n_tok.between(10, 1000)
        & (alpha_ratio >= 0.6)
        & (n_stop >= 1)
        & (dup_ratio <= 0.5)
    )


def _ingest_batch(batch: DataFrame, store_dir: str) -> None:
    """One micro-batch: gate -> dedup within batch and vs store -> split
    -> append partitioned by split."""
    spark = batch.sparkSession
    staged = (
        quality_gate(batch)
        .withColumn("fp", F.md5(F.col("text")))
        .dropDuplicates(["fp"])
    )
    if os.path.isdir(store_dir) and any(
        not f.startswith(("_", ".")) for f in os.listdir(store_dir)
    ):
        existing = spark.read.parquet(store_dir).select("fp")
        staged = staged.join(existing, "fp", "left_anti")
    out = deterministic_split(staged)
    out.write.mode("append").partitionBy("split").parquet(store_dir)


def run_corpus_pipeline(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema,
) -> None:
    """Drive the pipeline over all files currently in source_dir
    (Trigger.AvailableNow: batch-equivalent result, streaming
    exactly-once bookkeeping; re-runs pick up only new files)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _id: _ingest_batch(b, store_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
