#!/usr/bin/env python
"""Round-9 scale evidence, four claims measured (SCALE.md):

1. THE POSTING-INDEX FIX (VERDICT r8 item 1): the incremental dedup
   batch tail, FIXED batch, against 1x (sf0.1) / 10x (/tmp/sf1_slice)
   / 100x (/tmp/sf10_slice, generated here) standing corpora —
   round-8 `indexed` path (full posting scan of old_base per batch)
   vs the round-9 `bucketed` path (partition-pruned + In-pushed
   posting index). Claim: the indexed tail grows with the corpus (the
   measured r8 residual); the bucketed tail is near-flat across two
   decades.

2. LIVE VECTOR TIER AT 100x (VERDICT r8 item 5): append_batch +
   mid-fold live probe (x145's reader shape: standing + unfolded
   epochs, nprobe=4) + fold_appends against a standing index of 1x vs
   100x vectors, fixed batch.

3. GEMM CODEBOOK MEMORY BOUND (VERDICT r8 item 3): assign_cells at
   PRODUCTION dims — dim 768, k in {4096, 16384, 65536} (codebook 25
   -> 402 MB per python worker) over a 100k-row synthetic corpus. The
   slab fold (slab_cells=4096) bounds the transient score matrix at
   batch x slab doubles for any k, so wall should grow ~linearly with
   k (the GEMM itself) and never cliff on memory. Codebook bytes are
   reported next to wall; the per-worker residency math and the
   rebuild-to-PQ escape past ~0.5 GB are documented in SCALE.md.

4. THE STREAM FOLD (round-9 late): fold_batch with the layered
   bucketed index — standing state = the corpus folded in as 3
   batches, measured row = the fold of the FIXED 500-doc batch
   (median of 3 idempotent replays) at 1x/10x/100x. Claim: flat.

Run on an otherwise idle machine:
    python scripts/scale_round9_ops.py [claim1|claim2|claim3|claim4|gen]
(no arg = all; `gen` only builds the /tmp slices). Requires
scripts/scale_dedup_sf1.py to have generated /tmp/sf1_slice.
"""

from __future__ import annotations

import json
import shutil
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
SLICE10 = "/tmp/sf1_slice"
SLICE100 = "/tmp/sf10_slice"
DIM = 64


def get_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        # the shuffle-bytes accounting reads the UI stage list; the
        # default 1000-stage buffer evicts early stages mid-probe and
        # makes deltas read negative
        .config("spark.ui.retainedStages", "100000")
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


def gen_sf10(spark) -> None:
    """100-replica slice, same derivation as scale_dedup_sf1.generate
    (replica 0 verbatim; replicas permute word order with a per-doc
    salt so cross-replica shingle sets are fresh). Embeddings rotate
    per replica; replicas >= DIM additionally flip sign (a rotation
    alone would repeat exactly every DIM replicas and plant artificial
    exact-duplicate vectors)."""
    if Path(f"{SLICE100}/documents.parquet").exists():
        return
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = []
    for k in range(100):
        if k == 0:
            parts.append(docs)
            continue
        words = F.split(F.col("text"), " ")
        salt = F.concat(
            F.lit(f"r{k}:"), F.col("doc_id").cast("string"), F.lit(":")
        )
        perm = F.array_sort(
            F.transform(
                words,
                lambda w: F.struct(
                    F.xxhash64(F.concat(salt, w)).alias("h"), w.alias("w")
                ),
            )
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.array_join(
                    F.transform(perm, lambda s: s["w"]), " "
                ).alias("text"),
            )
        )
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.repartition(32).write.mode("overwrite").parquet(
        f"{SLICE100}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    eparts = []
    for k in range(100):
        if k == 0:
            eparts.append(emb.select("vec_id", "embedding", "label"))
            continue
        # (rotation, flip) = (k % DIM, k >= DIM) is injective for
        # k < 2*DIM, so no two replicas share a transform (k=64 is
        # rotation 0 WITH flip — pure negation, distinct from every
        # unflipped rotation; the earlier `or 1` fallback mapped
        # replicas 64 and 65 to the same transform and planted ~1M
        # artificial exact-duplicate vectors in the 100x slice)
        r = k % DIM
        rot = (
            F.col("embedding")
            if r == 0
            else F.concat(
                F.slice(F.col("embedding"), r + 1, DIM - r),
                F.slice(F.col("embedding"), 1, r),
            )
        )
        if k >= DIM:
            rot = F.transform(rot, lambda x: -x)
        eparts.append(
            emb.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                rot.alias("embedding"),
                F.col("label"),
            )
        )
    e = eparts[0]
    for p in eparts[1:]:
        e = e.unionByName(p)
    e.repartition(16).write.mode("overwrite").parquet(
        f"{SLICE100}/embeddings.parquet"
    )


def dedup_tail_probe(spark, docs_path: str, tag: str) -> list[tuple]:
    """Claim 1: FIXED 500-doc batch (sf0.1's %10==3 slice, ids shifted
    clear of every corpus) against standing state built over
    ``docs_path``; the r8 indexed tail and the r9 bucketed tail fold
    into the SAME state, timed back-to-back in one session."""
    from azure_serverless_etl_pipeline_spark.operators import dedup

    sc = spark.sparkContext
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    batch = (
        spark.read.parquet(f"{SF01}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 3)
        .select(
            (F.col("doc_id") + F.lit(1_900_000_000)).alias("doc_id"), "text"
        )
    )
    state = f"/tmp/scale_r9_dedup_{tag}"
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
    old_map = spark.read.parquet(f"{state}/old_map")

    def indexed():
        return dedup.ngram_jaccard_pairs_incremental_indexed(
            batch,
            spark.read.parquet(f"{state}/old_base"),
            spark.read.parquet(f"{state}/shingle_df"),
            threshold=0.5,
            max_shingle_freq=100,
        )

    def bucketed():
        return dedup.ngram_jaccard_pairs_incremental_bucketed(
            spark, batch, state, threshold=0.5, max_shingle_freq=100
        )

    # alternating in-session A/B, median of 3 (bench-measurement
    # discipline: tails are seconds-scale and solo one-shots are noisy)
    samples: dict[str, list] = {"indexed": [], "bucketed": []}
    mbs: dict[str, int] = {"indexed": 0, "bucketed": 0}
    for name, gen in [("indexed", indexed), ("bucketed", bucketed)]:
        noop(dedup.incremental_dup_clusters(old_map, gen()))  # warm-up
    for _ in range(3):
        for name, gen in [("indexed", indexed), ("bucketed", bucketed)]:
            s0, t0 = shuffle_bytes(sc), time.time()
            noop(dedup.incremental_dup_clusters(old_map, gen()))
            samples[name].append(time.time() - t0)
            mbs[name] += shuffle_bytes(sc) - s0
    import statistics

    for name in ("indexed", "bucketed"):
        rows.append(
            (f"dedup_tail_{name}_{tag}",
             round(statistics.median(samples[name]), 2),
             (mbs[name] // 3) >> 20)
        )
    shutil.rmtree(state, ignore_errors=True)
    return rows


def vector_live_probe(spark, emb_path: str, tag: str) -> list[tuple]:
    """Claim 2: fixed batch appended to a standing index over
    ``emb_path``; the mid-fold live read (x145's two-tier reader, 10
    queries, nprobe=4) and the fold are timed per scale."""
    from azure_serverless_etl_pipeline_spark.operators import ann_index
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        fold_appends,
        load_live_index,
    )

    sc = spark.sparkContext
    standing = spark.read.parquet(emb_path)
    batch = (
        spark.read.parquet(f"{SF01}/embeddings.parquet")
        .filter(F.col("vec_id") % 10 == 7)
        .withColumn("vec_id", F.col("vec_id") + F.lit(1_900_000_000))
    )
    queries = spark.read.parquet(f"{SF01}/embeddings.parquet").filter(
        F.col("vec_id") < 10
    )
    root = f"/tmp/scale_r9_ivf_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    ann_index.save_ivf_index(standing, root, k=16)
    rows: list[tuple] = []
    s0, t0 = shuffle_bytes(sc), time.time()
    append_batch(spark, batch, 0, root)
    rows.append(
        (f"vec_append_{tag}", round(time.time() - t0, 2),
         (shuffle_bytes(sc) - s0) >> 20)
    )
    cents = np.vstack(
        [
            np.asarray(r.centroid)
            for r in spark.read.parquet(f"{root}/centroids")
            .orderBy("cell")
            .collect()
        ]
    )
    s0, t0 = shuffle_bytes(sc), time.time()
    live = load_live_index(spark, root)
    noop(ann_index.probe_ivf(live, queries, cents, k=5, nprobe=4))
    rows.append(
        (f"vec_live_probe_{tag}", round(time.time() - t0, 2),
         (shuffle_bytes(sc) - s0) >> 20)
    )
    s0, t0 = shuffle_bytes(sc), time.time()
    fold_appends(spark, root)
    rows.append(
        (f"vec_fold_{tag}", round(time.time() - t0, 2),
         (shuffle_bytes(sc) - s0) >> 20)
    )
    shutil.rmtree(root, ignore_errors=True)
    return rows


def stream_fold_probe(spark, docs_path: str, tag: str) -> list[tuple]:
    """Claim 4 (round-9 late): the dedup STREAM's per-fold cost with the
    layered bucketed index. Standing state = the corpus folded in as 3
    batches (80% one-shot + two 10% incremental layers — so the probe
    reads MULTI-layer postings/df, not a degenerate single layer); the
    measured row is the fold of the FIXED 500-doc batch, median of 3
    idempotent replays (same batch id — each replay overwrites its own
    layer and reruns identical work)."""
    import statistics

    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        fold_batch,
    )

    sc = spark.sparkContext
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    batch = (
        spark.read.parquet(f"{SF01}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 3)
        .select(
            (F.col("doc_id") + F.lit(1_900_000_000)).alias("doc_id"), "text"
        )
    )
    state = f"/tmp/scale_r9_stream_{tag}"
    shutil.rmtree(state, ignore_errors=True)
    rows: list[tuple] = []
    s0, t0 = shuffle_bytes(sc), time.time()
    fold_batch(spark, docs.filter(F.col("doc_id") % 10 < 8), 0, state,
               max_shingle_freq=100)
    fold_batch(spark, docs.filter(F.col("doc_id") % 10 == 8), 1, state,
               max_shingle_freq=100)
    fold_batch(spark, docs.filter(F.col("doc_id") % 10 == 9), 2, state,
               max_shingle_freq=100)
    rows.append(
        (f"stream_state_build_{tag}", round(time.time() - t0, 2),
         (shuffle_bytes(sc) - s0) >> 20)
    )
    fold_batch(spark, batch, 3, state, max_shingle_freq=100)  # warm-up
    samples, mb = [], 0
    for _ in range(3):
        s0, t0 = shuffle_bytes(sc), time.time()
        fold_batch(spark, batch, 3, state, max_shingle_freq=100)
        samples.append(time.time() - t0)
        mb += shuffle_bytes(sc) - s0
    rows.append(
        (f"stream_fold_fixed_batch_{tag}",
         round(statistics.median(samples), 2), (mb // 3) >> 20)
    )
    shutil.rmtree(state, ignore_errors=True)
    return rows


def gemm_codebook_probe(spark) -> list[tuple]:
    """Claim 3: dim-768 assignment at production codebook sizes. The
    corpus is synthetic (100k rows, per-partition seeded numpy) — the
    testdata embeddings are dim 64; what is probed here is the memory/
    wall shape of the assignment itself."""
    import pandas as pd

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        assign_cells,
    )

    sc = spark.sparkContext
    dim = 768

    def make(batches):
        for pdf in batches:
            rng = np.random.default_rng(int(pdf["id"].iloc[0]))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["id"],
                    "embedding": list(
                        rng.normal(size=(len(pdf), dim)).astype(np.float32)
                    ),
                }
            )

    corpus = (
        spark.range(100_000)
        .repartition(32)
        .mapInPandas(make, schema="vec_id long, embedding array<float>")
        .localCheckpoint(eager=True)
    )
    rng = np.random.default_rng(9)
    rows: list[tuple] = []
    for k in (4096, 16384, 65536):
        cents = rng.normal(size=(k, dim))
        mb = cents.nbytes >> 20
        noop(assign_cells(corpus, cents))  # warm
        s0, t0 = shuffle_bytes(sc), time.time()
        noop(assign_cells(corpus, cents))
        rows.append(
            (f"assign_d768_k{k}_codebook{mb}MB", round(time.time() - t0, 2),
             (shuffle_bytes(sc) - s0) >> 20)
        )
    return rows


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if not Path(f"{SLICE10}/documents.parquet").exists():
        sys.exit("run scripts/scale_dedup_sf1.py first to generate sf1_slice")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    gen_sf10(spark)
    if what == "gen":
        return
    rows: list[tuple] = []
    if what in ("all", "claim1"):
        rows += dedup_tail_probe(spark, f"{SF01}/documents.parquet", "1x")
        rows += dedup_tail_probe(spark, f"{SLICE10}/documents.parquet", "10x")
        rows += dedup_tail_probe(spark, f"{SLICE100}/documents.parquet", "100x")
    if what in ("all", "claim2"):
        rows += vector_live_probe(spark, f"{SF01}/embeddings.parquet", "1x")
        rows += vector_live_probe(spark, f"{SLICE100}/embeddings.parquet", "100x")
    if what in ("all", "claim3"):
        rows += gemm_codebook_probe(spark)
    if what in ("all", "claim4"):
        rows += stream_fold_probe(spark, f"{SF01}/documents.parquet", "1x")
        rows += stream_fold_probe(spark, f"{SLICE10}/documents.parquet", "10x")
        rows += stream_fold_probe(
            spark, f"{SLICE100}/documents.parquet", "100x"
        )
    print("| op | sec | shuffle MB |")
    print("|---|---|---|")
    for name, sec, mb in rows:
        print(f"| {name} | {sec} | {mb} |")


if __name__ == "__main__":
    main()
