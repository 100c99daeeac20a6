#!/usr/bin/env python
"""Round-10 scale evidence, four claims measured (SCALE.md):

1. MEMBERSHIP BLOOM (VERDICT r9 item 4): the dedup stream's
   re-delivery guard probes the standing ``ids/`` layers for every
   arriving id; without the bloom the exact probe's bytes grow with
   the accumulated layer count (every file's footer + the row groups
   any arriving id matches), with it the covered layers are probed
   only for the batch's bloom-maybe ids — bytes track TRUE
   re-deliveries + fpp. Measured: the guard's probe (the exact code
   path fold_batch runs, mirrored here) over synthesized id layers at
   16 vs 256 layers, dirty (100/500 redelivered) and clean batches.

2. LARGE-BATCH DE-COLLECT (VERDICT r9 item 6): a 100k-doc arriving
   batch through the bucketed incremental pair generator — the old
   unconditional collect would land ~100k ids + shingle hashes on the
   driver; the capped probes land at most 2049 rows (~16 KB) by
   construction in the semi-join regime. Measured: wall + shuffle for
   the 100k batch vs the 500-doc reference against the same sf0.1
   standing state.

3. CELL-SPLIT MAINTENANCE (VERDICT r9 item 5): fold_appends' unit of
   work is the AFFECTED CELL — at a 100x corpus under a frozen k=16
   codebook each affected cell holds ~12.5k vectors (SCALE.md round 9
   table 2 measured the fold's 1.7x as exactly this). split_cells
   grows k until occupancy <= target; a locality-clustered append
   batch (the realistic arrival: new content near existing modes)
   then rewrites a few SMALL cells instead of a few huge ones.
   Measured: fold of the same 500-vector clustered batch before vs
   after splitting to 2k occupancy, same 200k standing index.

4. IVFPQ SERVING RESIDENCY (VERDICT r9 item 1): at dim 768 the flat
   GEMM assignment's broadcast codebook is k x dim x 8 B per python
   worker (402 MB at k=65536 — round 9 table 3 measured the wall; the
   residency bound is the documented escape trigger). The composed
   IVFADC index's resident artifacts are the coarse centroids + the
   m subspace codebooks — measured here by building the index over
   the same 100k x 768 synthetic corpus and weighing the artifacts,
   plus served probe walls at production knobs.

Run on an otherwise idle machine:
    python scripts/scale_round10_ops.py [claim1..claim5]
(no arg = all).
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
DIM = 64


def get_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedStages", "100000")
        .getOrCreate()
    )


def _stages(sc):
    ui, app = sc.uiWebUrl, sc.applicationId
    return json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )


def shuffle_bytes(sc) -> int:
    return sum(s.get("shuffleWriteBytes", 0) for s in _stages(sc))


def input_bytes(sc) -> int:
    return sum(s.get("inputBytes", 0) for s in _stages(sc))


def output_bytes(sc) -> int:
    return sum(s.get("outputBytes", 0) for s in _stages(sc))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# ---------------------------------------------------------------------------
# claim 1: membership bloom
# ---------------------------------------------------------------------------


def bloom_probe(spark) -> list[tuple]:
    """Mirrors fold_batch's re-delivery guard (dedup_stream.py): the
    plain path probes every id layer with the arriving ids; the bloom
    path filters arriving ids through the broadcast bitmap first and
    probes the covered layers only for maybe-hits. 1M standing ids;
    id->layer assignment strided so every file spans the full id range
    (the worst case for row-group skipping, and the realistic one —
    arrival order is uncorrelated with id order)."""
    from azure_serverless_etl_pipeline_spark.operators.dedup import (
        _bloom_hash_cols,
        _bloom_might_contain,
        _keys_pruned_capped,
    )
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        _read_membership_bloom,
        build_membership_bloom,
    )

    sc = spark.sparkContext
    rows: list[tuple] = []
    n_ids = 1_000_000
    for n_layers in (16, 256):
        state = f"/tmp/scale_r10_bloom_{n_layers}"
        shutil.rmtree(state, ignore_errors=True)
        ids = spark.range(n_ids).select(F.col("id").alias("doc_id"))
        for k in range(n_layers):
            (
                ids.filter(F.col("doc_id") % n_layers == k)
                .coalesce(1)
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(f"{state}/ids/batch={k}")
            )
        t0 = time.time()
        build_membership_bloom(spark, state)
        build_s = round(time.time() - t0, 2)
        art = _read_membership_bloom(spark, state)
        layer_paths = [f"{state}/ids/batch={k}" for k in range(n_layers)]

        def dirty_batch(n_red: int):
            red = spark.range(n_red).select(
                (F.col("id") * 9973).alias("doc_id")  # existing, scattered
            )
            new = spark.range(500 - n_red).select(
                (F.col("id") + 5_000_000).alias("doc_id")
            )
            return red.unionByName(new).localCheckpoint(eager=True)

        def plain(arr):
            pruned, _ = _keys_pruned_capped(
                spark.read.schema("doc_id long").parquet(*layer_paths),
                "doc_id",
                arr,
                2048,
            )
            return arr.join(pruned, "doc_id", "left_anti").count()

        def bloomed(arr):
            might = _bloom_might_contain(
                spark, art["bitmap"], art["n_bits"], art["n_hashes"]
            )
            h1, h2 = _bloom_hash_cols("doc_id")
            maybe = arr.filter(might(h1, h2))
            pruned, vals = _keys_pruned_capped(
                spark.read.schema("doc_id long").parquet(*layer_paths),
                "doc_id",
                maybe,
                2048,
            )
            if vals == []:  # the fold's clean-batch fast path
                return arr.count()
            return arr.join(pruned, "doc_id", "left_anti").count()

        for tag, n_red in (("dirty100", 100), ("clean", 0)):
            arr = dirty_batch(n_red)
            want = 500 - n_red
            for name, fn in (("plain", plain), ("bloom", bloomed)):
                fn(arr)  # warm
                samples, ib = [], 0
                for _ in range(3):
                    i0, t0 = input_bytes(sc), time.time()
                    got = fn(arr)
                    samples.append(time.time() - t0)
                    ib += input_bytes(sc) - i0
                    assert got == want, (name, tag, got, want)
                rows.append(
                    (
                        f"guard_{name}_{n_layers}layers_{tag}",
                        round(statistics.median(samples), 2),
                        (ib // 3) >> 10,  # KiB read
                    )
                )
        rows.append((f"bloom_build_{n_layers}layers", build_s, 0))
        shutil.rmtree(state, ignore_errors=True)
    return rows


# ---------------------------------------------------------------------------
# claim 2: large-batch de-collect
# ---------------------------------------------------------------------------


def _replicate_docs(spark, docs, n_rep: int, id_shift: int):
    """The round-9 salt-permute replica recipe: word order permuted per
    (replica, doc) so cross-replica shingle sets are fresh."""
    parts = []
    for k in range(n_rep):
        words = F.split(F.col("text"), " ")
        salt = F.concat(
            F.lit(f"b{k}:"), F.col("doc_id").cast("string"), F.lit(":")
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
                (F.col("doc_id") + id_shift + k * 10_000_000).alias(
                    "doc_id"
                ),
                F.array_join(F.transform(perm, lambda s: s["w"]), " ").alias(
                    "text"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def decollect_probe(spark) -> list[tuple]:
    from azure_serverless_etl_pipeline_spark.operators import dedup

    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text"
    )
    state = "/tmp/scale_r10_decollect"
    shutil.rmtree(state, ignore_errors=True)
    rows: list[tuple] = []
    s0, t0 = shuffle_bytes(sc), time.time()
    dedup.materialize_incremental_state(
        docs, state, threshold=0.5, max_shingle_freq=100
    )
    rows.append(
        (
            "decollect_state_build",
            round(time.time() - t0, 2),
            (shuffle_bytes(sc) - s0) >> 20,
        )
    )
    small = (
        docs.filter(F.col("doc_id") % 10 == 3)
        .select((F.col("doc_id") + 1_900_000_000).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    big = _replicate_docs(spark, docs, 20, 1_000_000_000).localCheckpoint(
        eager=True
    )
    for tag, batch in (("500doc", small), ("100kdoc", big)):

        def run():
            noop(
                dedup.ngram_jaccard_pairs_incremental_bucketed(
                    spark,
                    batch,
                    state_dir=state,
                    threshold=0.5,
                    max_shingle_freq=100,
                )
            )
            spark.catalog.clearCache()

        run()  # warm
        samples, mb = [], 0
        for _ in range(3):
            s0, t0 = shuffle_bytes(sc), time.time()
            run()
            samples.append(time.time() - t0)
            mb += shuffle_bytes(sc) - s0
        rows.append(
            (
                f"incremental_tail_{tag}_batch",
                round(statistics.median(samples), 2),
                (mb // 3) >> 20,
            )
        )
    shutil.rmtree(state, ignore_errors=True)
    return rows


# ---------------------------------------------------------------------------
# claim 3: cell-split maintenance
# ---------------------------------------------------------------------------


def _emb_100x(spark):
    """100 replicas of sf0.1 embeddings (round-9 injective derivation:
    rotation k % DIM, sign flip for k >= DIM)."""
    out = "/tmp/scale_r10_emb100x"
    if Path(f"{out}/_SUCCESS").exists():
        return spark.read.parquet(out)
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    parts = []
    for k in range(100):
        if k == 0:
            parts.append(emb.select("vec_id", "embedding"))
            continue
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
        parts.append(
            emb.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                rot.alias("embedding"),
            )
        )
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.repartition(16).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def split_fold_probe(spark) -> list[tuple]:
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        ivf_cell_stats,
        save_ivf_index,
        split_cells,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        fold_appends,
    )

    sc = spark.sparkContext
    corpus = _emb_100x(spark)
    # locality-clustered append batch: 500 small perturbations of one
    # standing vector — the realistic arrival (new content lands near
    # existing modes), and the shape where cell SIZE decides fold cost
    seed_vec = np.asarray(
        corpus.filter(F.col("vec_id") == 7).collect()[0].embedding,
        dtype=np.float64,
    )
    rng = np.random.default_rng(10)
    batch = spark.createDataFrame(
        [
            (
                3_000_000_000 + i,
                [
                    float(x)
                    for x in (
                        seed_vec + rng.normal(scale=0.05, size=DIM)
                    ).astype(np.float32)
                ],
            )
            for i in range(500)
        ],
        "vec_id long, embedding array<float>",
    ).localCheckpoint(eager=True)

    rows: list[tuple] = []
    for tag, do_split in (("frozen_k16", False), ("split_occ2k", True)):
        path = f"/tmp/scale_r10_split_{tag}"
        shutil.rmtree(path, ignore_errors=True)
        save_ivf_index(corpus, path, k=16)
        if do_split:
            t0 = time.time()
            n_rounds = 0
            while n_rounds < 12:
                rep = split_cells(spark, path, target_occupancy=2000)
                n_rounds += 1
                if rep.count() == 0:
                    break
            k_after = (
                spark.read.parquet(f"{path}/centroids").count()
            )
            rows.append(
                (
                    f"split_maintenance_to_occ2k_k{k_after}",
                    round(time.time() - t0, 2),
                    0,
                )
            )
        # median-of-3 idempotent replays of the SAME epoch fold
        samples, ob, aff = [], 0, None
        for i in range(3):
            append_batch(spark, batch, 0, path)
            o0, t0 = output_bytes(sc), time.time()
            stats = fold_appends(spark, path)
            samples.append(time.time() - t0)
            ob += output_bytes(sc) - o0
            aff = stats["affected_cells"]
        occ = (
            ivf_cell_stats(spark, path)
            .agg(F.max("n_vecs").alias("m"))
            .collect()[0]
            .m
        )
        rows.append(
            (
                f"fold_clustered500_{tag}_aff{aff}_maxocc{occ}",
                round(statistics.median(samples), 2),
                (ob // 3) >> 10,  # KiB WRITTEN by the fold's rewrite
            )
        )
        shutil.rmtree(path, ignore_errors=True)
    return rows


# ---------------------------------------------------------------------------
# claim 5: rebuild_updated cost vs standing-corpus size
# ---------------------------------------------------------------------------


def rebuild_scale_probe(spark) -> list[tuple]:
    """The UPDATE path's cost must track the update and what it touches
    (pair discovery prunes to batch-touching postings; the member
    recompute is bounded by the affected components + cap-flip
    holders), NOT the standing corpus. Same FIXED 250-doc update
    workload (changed text for sf0.1 ids % 20 == 3) against a standing
    stream state of 1x vs 10x documents."""
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        fold_batch,
        rebuild_updated,
    )

    sc = spark.sparkContext
    docs1x = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text"
    )
    rows: list[tuple] = []
    for tag, n_rep in (("1x", 1), ("10x", 10)):
        state = f"/tmp/scale_r10_rebuild_{tag}"
        shutil.rmtree(state, ignore_errors=True)
        corpus = (
            docs1x
            if n_rep == 1
            else docs1x.unionByName(
                _replicate_docs(spark, docs1x, n_rep - 1, 100_000_000)
            )
        )
        s0, t0 = shuffle_bytes(sc), time.time()
        for j in range(3):
            fold_batch(
                spark, corpus.filter(F.col("doc_id") % 3 == j), j, state,
                max_shingle_freq=100,
            )
        rows.append(
            (
                f"rebuild_state_build_{tag}",
                round(time.time() - t0, 2),
                (shuffle_bytes(sc) - s0) >> 20,
            )
        )
        updates = docs1x.filter(F.col("doc_id") % 20 == 3).withColumn(
            "text", F.concat(F.col("text"), F.lit(" revised in round ten"))
        )
        fold_batch(spark, updates, 3, state, max_shingle_freq=100)
        s0, t0 = shuffle_bytes(sc), time.time()
        stats = rebuild_updated(spark, state, max_shingle_freq=100)
        rows.append(
            (
                f"rebuild_fixed250upd_{tag}_members{stats['members']}",
                round(time.time() - t0, 2),
                (shuffle_bytes(sc) - s0) >> 20,
            )
        )
        shutil.rmtree(state, ignore_errors=True)
    return rows


# ---------------------------------------------------------------------------
# claim 4: IVFPQ serving residency
# ---------------------------------------------------------------------------


def ivfpq_residency_probe(spark) -> list[tuple]:
    import pandas as pd

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivfpq_index,
        search_ivfpq,
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
    idx = "/tmp/scale_r10_ivfpq"
    shutil.rmtree(idx, ignore_errors=True)
    rows: list[tuple] = []
    t0 = time.time()
    save_ivfpq_index(corpus, idx, k=256, m=24, pq_k=256)
    rows.append(("ivfpq_build_d768_k256_m24", round(time.time() - t0, 2), 0))

    def du(sub: str) -> int:
        return sum(
            f.stat().st_size for f in Path(f"{idx}/{sub}").rglob("*") if f.is_file()
        )

    cent_mb = du("centroids") / 1e6
    books_mb = du("pq_codebooks") / 1e6
    codes_mb = du("codes") / 1e6
    flat_gemm_mb = 65536 * dim * 8 / 1e6
    rows.append(
        (
            f"resident_artifacts_cent{cent_mb:.1f}MB_books{books_mb:.1f}MB"
            f"_vs_flatgemm{flat_gemm_mb:.0f}MB",
            0.0,
            int(codes_mb),
        )
    )
    queries = corpus.filter(F.col("vec_id") < 100).localCheckpoint(eager=True)
    for np_, sl in ((8, 500), (32, 1000)):

        def run():
            return search_ivfpq(
                spark, idx, queries, k=10, nprobe=np_, shortlist=sl
            ).count()

        run()  # warm
        samples = []
        for _ in range(3):
            t0 = time.time()
            run()
            samples.append(time.time() - t0)
        rows.append(
            (
                f"ivfpq_probe_100q_nprobe{np_}_shortlist{sl}",
                round(statistics.median(samples), 2),
                0,
            )
        )
    shutil.rmtree(idx, ignore_errors=True)
    return rows


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rows: list[tuple] = []
    if what in ("all", "claim1"):
        rows += bloom_probe(spark)
    if what in ("all", "claim2"):
        rows += decollect_probe(spark)
    if what in ("all", "claim3"):
        rows += split_fold_probe(spark)
    if what in ("all", "claim4"):
        rows += ivfpq_residency_probe(spark)
    if what in ("all", "claim5"):
        rows += rebuild_scale_probe(spark)
    print("| op | sec | bytes col |")
    print("|---|---|---|")
    for name, sec, b in rows:
        print(f"| {name} | {sec} | {b} |")


if __name__ == "__main__":
    main()
