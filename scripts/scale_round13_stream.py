#!/usr/bin/env python
"""Round-13 stream-at-scale re-run (VERDICT r12 item 1): the identical
1M x 64 stream loop round 12 measured (200k build + 16 epochs x 50k
arrivals; exactly-once keyed append + PQ-aware split + compaction +
drift check on the same cadences), now with compact_ivf_index's
candidate discovery BOUNDED BY THE DIRTY SET.

The round-12 run proved plain-append epochs flat (1.02x early->late)
but measured the one index-proportional term honestly: COMPACT epochs
grew 61s @ 550k -> 99s @ 950k standing rows, because candidate
discovery listed every cell= directory of the standing index and
compacted every one of them. The claim this re-run must prove: with
discovery bounded by the dirty set (leaves touched since the last
compact), compact epochs stop tracking the standing index -- the late
compact epoch must cost about the same as the early one at the same
cadence window (both cover COMPACT_EVERY=8 epochs of appends), while
plain epochs stay flat and the final row accounting stays exact.

Run on an otherwise idle machine:
    python scripts/scale_round13_stream.py
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DIM = 64
BUILD_N = 200_000
EPOCHS = 16
BATCH_N = 50_000
FOLD_EVERY = 4        # split cadence (PQ-aware)
COMPACT_EVERY = 8
REFIT_CHECK_EVERY = 4


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


def _frame(spark, X, id_base):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(id_base, id_base + len(X), dtype=np.int64),
            "embedding": [v.tolist() for v in X.astype(np.float32)],
            "label": np.zeros(len(X), dtype=np.int32),
        }
    )
    return spark.createDataFrame(pdf).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )


def main() -> None:
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        needs_refit,
        save_ivfpq_index,
        search_ivfpq,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        start_vector_ingest_stream,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/scale_r13_stream"
    shutil.rmtree(root, ignore_errors=True)
    idx, landing, ckpt = f"{root}/index", f"{root}/landing", f"{root}/ckpt"

    rng = np.random.default_rng(12)
    modes = rng.normal(size=(16, DIM)) * 3.0

    def clustered(n, seed):
        r = np.random.default_rng(seed)
        picks = r.integers(0, 16, size=n)
        return modes[picks] + r.normal(size=(n, DIM)) * 0.6

    t0 = time.time()
    save_ivfpq_index(
        _frame(spark, clustered(BUILD_N, 1), 0).repartition(32),
        idx, k=16, m=8, pq_k=16,
    )
    print(f"build {BUILD_N} x {DIM}: {time.time() - t0:.1f}s", flush=True)

    # one parquet file per epoch, written up front (maxFilesPerTrigger=1)
    for e in range(EPOCHS):
        _frame(
            spark, clustered(BATCH_N, 100 + e), 1_000_000 + e * BATCH_N
        ).coalesce(1).write.mode("append").parquet(landing)

    occ = (
        spark.read.parquet(f"{idx}/cells")
        .groupBy("cell").count().toPandas()["count"]
    )
    target = int(2.0 * occ.median())
    t0 = time.time()
    q = start_vector_ingest_stream(
        spark, landing, idx, ckpt,
        fold_every=FOLD_EVERY,
        split_occupancy=target,
        ivfpq=True,
        compact_every=COMPACT_EVERY,
        refit_check_every=REFIT_CHECK_EVERY,
        drift_threshold=1.5,
    )
    q.awaitTermination(3600)
    total = time.time() - t0
    prog = q.recentProgress
    print(f"\n{EPOCHS} epochs x {BATCH_N}: {total:.1f}s total", flush=True)
    print("epoch | standing rows before | trigger s | maintenance")
    standing = BUILD_N
    walls = []
    for p in prog:
        if p["numInputRows"] == 0:
            continue
        b = int(p["batchId"])
        dur = p["durationMs"]["triggerExecution"] / 1000.0
        maint = []
        if (b + 1) % FOLD_EVERY == 0:
            maint.append("split")
        if (b + 1) % COMPACT_EVERY == 0:
            maint.append("compact")
        if (b + 1) % REFIT_CHECK_EVERY == 0:
            maint.append("drift-check")
        walls.append((b, standing, dur, "+".join(maint) or "-"))
        print(f"{b:5d} | {standing:8d} | {dur:7.1f} | {'+'.join(maint) or '-'}")
        standing += int(p["numInputRows"])

    compacts = [w for w in walls if "compact" in w[3]]
    if len(compacts) >= 2:
        detail = " / ".join(
            f"{w[2]:.1f}s @ {w[1]} standing" for w in compacts
        )
        ratio = compacts[-1][2] / compacts[0][2]
        print(
            f"\ncompact epochs: {detail} (late/early {ratio:.2f}; the "
            "round-12 census discovery read 61s @ 550k -> 99s @ 950k, "
            "ratio 1.62 — flat means discovery no longer tracks the "
            "standing index)"
        )

    plain = [w for w in walls if w[3] == "-"]
    if len(plain) >= 4:
        half = len(plain) // 2
        early = sum(w[2] for w in plain[:half]) / half
        late = sum(w[2] for w in plain[half:]) / (len(plain) - half)
        print(
            f"\nplain-append epochs: early-half mean {early:.1f}s vs "
            f"late-half mean {late:.1f}s (ratio {late / early:.2f}) — "
            "flat == per-epoch cost tracks the batch, not the index"
        )

    n_cells = spark.read.parquet(f"{idx}/centroids").count()
    cells_n = spark.read.parquet(f"{idx}/cells").count()
    codes_n = spark.read.parquet(f"{idx}/codes").count()
    print(f"final: {cells_n} cells rows / {codes_n} codes rows / "
          f"k'={n_cells}")
    assert cells_n == codes_n == BUILD_N + EPOCHS * BATCH_N
    drift = needs_refit(spark, idx, recent_batches=REFIT_CHECK_EVERY)
    print(f"drift at close: ratio={drift['ratio']:.3f} "
          f"needs_refit={drift['needs_refit']}")

    queries = _frame(spark, clustered(20, 999), 5_000_000)
    t0 = time.time()
    n = search_ivfpq(spark, idx, queries, k=5, nprobe=4, shortlist=100).count()
    print(f"probe nprobe=4 over the 1M live index: {time.time() - t0:.1f}s "
          f"({n} rows)")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
