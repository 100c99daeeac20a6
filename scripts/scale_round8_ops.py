#!/usr/bin/env python
"""Round-8 scale evidence, two claims measured (SCALE.md):

1. ``assign_cells`` past the literal-plan bound (VERDICT r7 item 2):
   the 256-cell literal-expression path vs the Arrow-GEMM path on the
   SAME input (in-session A/B, median of 3 each), then GEMM-only
   timings at 1024 and 4096 cells — production IVF codebook sizes the
   literal plan cannot express. All variants must record ZERO shuffle
   (the assignment is map-side in both regimes).

2. "Fold cost tracks batch size, not corpus" (VERDICT r7 item 4):
   a FIXED batch folded into a 1x (sf0.1) and a 10x (/tmp/sf1_slice,
   scale_dedup_sf1.py) standing corpus — if the amortization story
   holds, the per-batch tail moves far less than 10x:
   - vector tier: append_batch + fold_appends against a standing IVF
     index built over each corpus (the fold pays a batch-sized sliver
     rewrite PLUS the round-8 stale-cell semi-join, a column-pruned
     (vec_id, cell) scan of the standing tier — the one corpus-linear
     term, metadata-weight by design);
   - text tier: the x117b per-batch tail (indexed incremental pair
     mine + cluster fold) against materialized state built over each
     corpus (the one linear term is the posting-list scan of
     old_base; everything wide is batch-bounded).

Run on an otherwise idle machine: python scripts/scale_round8_ops.py
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SLICE = "/tmp/sf1_slice"


def get_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def shuffle_bytes(sc) -> int:
    ui, app = sc.uiWebUrl, sc.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def assign_probe(spark) -> list[tuple]:
    """Claim 1: literal-vs-GEMM A/B at 256 cells + GEMM at 1k/4k."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        assign_cells,
    )

    sc = spark.sparkContext
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    rng = np.random.default_rng(8)
    rows: list[tuple] = []

    def timed3(name, thunk):
        thunk()  # warm-up
        s0 = shuffle_bytes(sc)
        samples = []
        for _ in range(3):
            t0 = time.time()
            thunk()
            samples.append(time.time() - t0)
        rows.append(
            (
                name,
                round(statistics.median(samples), 2),
                (shuffle_bytes(sc) - s0) >> 20,
            )
        )

    # crossover sweep + the 256-cell headline: literal and GEMM
    # interleave inside one session so JIT/session warmth cancels
    # (bench-measurement discipline). The literal arm must be FORCED —
    # the production default routes everything through the GEMM.
    for k in (16, 32, 64, 128, 256):
        cents = rng.normal(size=(k, 64))
        lit_force = {"max_literal_cells": 10**9}
        noop(assign_cells(emb, cents, **lit_force))  # warm both paths
        noop(assign_cells(emb, cents))
        lit = []
        gem = []
        lit_mb = gem_mb = 0
        for _ in range(3):
            s0, t0 = shuffle_bytes(sc), time.time()
            noop(assign_cells(emb, cents, **lit_force))
            lit.append(time.time() - t0)
            lit_mb += shuffle_bytes(sc) - s0
            s0, t0 = shuffle_bytes(sc), time.time()
            noop(assign_cells(emb, cents))
            gem.append(time.time() - t0)
            gem_mb += shuffle_bytes(sc) - s0
        rows.append(
            (f"assign_{k}_literal", round(statistics.median(lit), 2), lit_mb >> 20)
        )
        rows.append(
            (f"assign_{k}_gemm", round(statistics.median(gem), 2), gem_mb >> 20)
        )
    for k in (1024, 4096):
        cents = rng.normal(size=(k, 64))
        timed3(f"assign_{k}_gemm", lambda c=cents: noop(assign_cells(emb, c)))
    return rows


def vector_fold_probe(spark, emb_path: str, tag: str) -> list[tuple]:
    """Claim 2a: FIXED 10%-of-sf0.1 batch against a standing index of
    1x vs 10x vectors; the batch is identical at both scales."""
    from azure_serverless_etl_pipeline_spark.operators import ann_index
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        fold_appends,
    )

    sc = spark.sparkContext
    standing = spark.read.parquet(emb_path)
    # fixed batch: sf0.1's % 10 == 7 slice, ids shifted clear of BOTH
    # corpora (the slice replicas top out far below 9e8)
    batch = (
        spark.read.parquet(f"{SF01}/embeddings.parquet")
        .filter(F.col("vec_id") % 10 == 7)
        .withColumn("vec_id", F.col("vec_id") + F.lit(900_000_000))
    )
    root = f"/tmp/scale_r8_ivf_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    ann_index.save_ivf_index(standing, root, k=16)
    rows: list[tuple] = []
    s0, t0 = shuffle_bytes(sc), time.time()
    append_batch(spark, batch, 0, root)
    rows.append(
        (f"vec_append_batch_{tag}", round(time.time() - t0, 2),
         (shuffle_bytes(sc) - s0) >> 20)
    )
    s0, t0 = shuffle_bytes(sc), time.time()
    fold_appends(spark, root)
    rows.append(
        (f"vec_fold_batch_{tag}", round(time.time() - t0, 2),
         (shuffle_bytes(sc) - s0) >> 20)
    )
    shutil.rmtree(root, ignore_errors=True)
    return rows


def dedup_tail_probe(spark, docs_path: str, tag: str) -> list[tuple]:
    """Claim 2b: x117b's per-batch tail (indexed incremental mine +
    cluster fold) with a FIXED batch against 1x vs 10x materialized
    state. State build time is reported separately (the amortized
    one-time cost; it legitimately scales with the corpus)."""
    from azure_serverless_etl_pipeline_spark.operators import dedup

    sc = spark.sparkContext
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    # fixed batch: 10% of sf0.1's docs re-delivered verbatim with ids
    # shifted clear of both corpora — every batch doc near-dups its
    # original, so the tail does real pair work at both scales
    batch = (
        spark.read.parquet(f"{SF01}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 3)
        .select(
            (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"), "text"
        )
    )
    state = f"/tmp/scale_r8_dedup_{tag}"
    shutil.rmtree(state, ignore_errors=True)
    rows: list[tuple] = []
    s0, t0 = shuffle_bytes(sc), time.time()
    dedup.materialize_incremental_state(
        docs, state, threshold=0.5, max_shingle_freq=100
    )
    rows.append(
        (f"dedup_state_build_{tag}", round(time.time() - t0, 2),
         (shuffle_bytes(sc) - s0) >> 20)
    )
    old_base = spark.read.parquet(f"{state}/old_base")
    old_df = spark.read.parquet(f"{state}/shingle_df")
    old_map = spark.read.parquet(f"{state}/old_map")
    s0, t0 = shuffle_bytes(sc), time.time()
    pairs = dedup.ngram_jaccard_pairs_incremental_indexed(
        batch, old_base, old_df, threshold=0.5, max_shingle_freq=100
    )
    merged = dedup.incremental_dup_clusters(old_map, pairs)
    noop(merged)
    rows.append(
        (f"dedup_batch_tail_{tag}", round(time.time() - t0, 2),
         (shuffle_bytes(sc) - s0) >> 20)
    )
    shutil.rmtree(state, ignore_errors=True)
    return rows


def main() -> None:
    if not Path(f"{SLICE}/documents.parquet").exists():
        sys.exit("run scripts/scale_dedup_sf1.py first to generate the slice")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rows: list[tuple] = []
    rows += assign_probe(spark)
    rows += vector_fold_probe(spark, f"{SF01}/embeddings.parquet", "1x")
    rows += vector_fold_probe(spark, f"{SLICE}/embeddings.parquet", "10x")
    rows += dedup_tail_probe(spark, f"{SF01}/documents.parquet", "1x")
    rows += dedup_tail_probe(spark, f"{SLICE}/documents.parquet", "10x")
    print("| op | sec | shuffle MB |")
    print("|---|---|---|")
    for name, sec, mb in rows:
        print(f"| {name} | {sec} | {mb} |")


if __name__ == "__main__":
    main()
