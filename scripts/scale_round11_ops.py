#!/usr/bin/env python
"""Round-11 scale evidence, two claims measured (SCALE.md):

1. PQ-AWARE CELL SPLIT (VERDICT r10 item 1): the served IVFADC index
   previously refused split maintenance — the only occupancy escape was
   a FULL save_ivfpq_index rebuild (k-means refit + full-corpus
   re-encode + full rewrite). The split relocates only the hot cells'
   rows AND code rows (no re-encode — codes encode raw vectors).
   Measured on a skewed 200k x 64 corpus (two hot modes): split-until-
   target wall + bytes written vs the full rebuild's, and the served
   probe's input bytes at fixed nprobe before vs after (a probe reads
   nprobe cells' codes — occupancy IS its I/O term).

2. CODEBOOK DRIFT MONITOR (VERDICT r10 item 5): every keyed append
   records its batch's mean PQ quantization error via an Observation
   riding the codes write (zero extra jobs); needs_refit compares the
   pooled recent mean against the build-time baseline. Measured:
   in-distribution appends vs a planted off-distribution batch — the
   ratio separation — plus the monitor's own driver cost.

Run on an otherwise idle machine:
    python scripts/scale_round11_ops.py [claim1 claim2]
(no arg = all).
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


def input_bytes(sc) -> int:
    return sum(s.get("inputBytes", 0) for s in _stages(sc))


def output_bytes(sc) -> int:
    return sum(s.get("outputBytes", 0) for s in _stages(sc))


def _skewed_corpus(spark, n=200_000, hot_frac=0.15):
    """Clustered synthetic corpus with two dominant modes: after a k=16
    build, two cells run hot (the drifted-arrival shape) while the rest
    sit near the mean — the setup where split maintenance should
    rewrite a couple of directories, not the index."""
    rng = np.random.default_rng(11)
    modes = rng.normal(size=(16, DIM)) * 3.0
    n_hot = int(n * hot_frac)
    picks = np.concatenate(
        [
            np.zeros(n_hot // 2, dtype=int),
            np.ones(n_hot - n_hot // 2, dtype=int),
            rng.integers(2, 16, size=n - n_hot),
        ]
    )
    X = modes[picks] + rng.normal(size=(n, DIM)) * 0.6
    import pandas as pd

    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [v.tolist() for v in X.astype(np.float32)]}
    )
    return spark.createDataFrame(pdf).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    ).repartition(32).localCheckpoint(eager=True)


def claim1(spark) -> list[tuple]:
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivfpq_index,
        search_ivfpq,
        split_cells,
    )

    sc = spark.sparkContext
    rows: list[tuple] = []
    corpus = _skewed_corpus(spark)
    queries = corpus.limit(20).localCheckpoint(eager=True)
    idx = "/tmp/scale_r11_pqsplit/index"
    shutil.rmtree("/tmp/scale_r11_pqsplit", ignore_errors=True)

    t0 = time.time()
    save_ivfpq_index(corpus, idx, k=16, m=8, pq_k=16)
    build_s = time.time() - t0

    occ = (
        spark.read.parquet(f"{idx}/cells")
        .groupBy("cell")
        .count()
        .toPandas()["count"]
    )
    rows.append(("initial build (k-means + encode + write)", round(build_s, 2), ""))
    rows.append(
        ("occupancy before split (max / median)", int(occ.max()), int(occ.median()))
    )

    def probe(tag):
        b0, t0 = input_bytes(sc), time.time()
        n = search_ivfpq(spark, idx, queries, k=5, nprobe=2, shortlist=50).count()
        rows.append(
            (f"probe nprobe=2 {tag} (sec / input MB)",
             round(time.time() - t0, 2),
             round((input_bytes(sc) - b0) / 1e6, 1))
        )
        assert n > 0

    probe("BEFORE split")

    # split only what actually ran hot: 1.5x the median occupancy
    target = int(1.5 * occ.median())
    t0, o0 = time.time(), output_bytes(sc)
    n_split = 0
    for _ in range(8):
        rep = split_cells(spark, idx, target_occupancy=target)
        c = rep.count()
        n_split += c
        if c == 0:
            break
    split_s, split_mb = time.time() - t0, (output_bytes(sc) - o0) / 1e6
    occ2 = (
        spark.read.parquet(f"{idx}/cells").groupBy("cell").count().toPandas()["count"]
    )
    rows.append(
        (f"split to occupancy<={target} ({n_split} cells split; sec / written MB)",
         round(split_s, 2), round(split_mb, 1))
    )
    rows.append(
        ("occupancy after split (max / median)", int(occ2.max()), int(occ2.median()))
    )
    # tier agreement (the relocation's correctness, also pytest-pinned)
    cells = spark.read.parquet(f"{idx}/cells").select(
        "vec_id", F.col("cell").cast("int").alias("cell")
    )
    codes = spark.read.parquet(f"{idx}/codes").select(
        "vec_id", F.col("cell").cast("int").alias("code_cell")
    )
    mism = (
        codes.join(cells, "vec_id")
        .filter(F.col("code_cell") != F.col("cell"))
        .count()
    )
    rows.append(("codes/cells cell disagreement after split", mism, ""))

    probe("AFTER split")

    # the old escape: full rebuild
    idx2 = "/tmp/scale_r11_pqsplit/rebuild"
    t0, o0 = time.time(), output_bytes(sc)
    save_ivfpq_index(corpus, idx2, k=32, m=8, pq_k=16)
    rows.append(
        ("full save_ivfpq_index rebuild (the pre-r11 escape; sec / written MB)",
         round(time.time() - t0, 2),
         round((output_bytes(sc) - o0) / 1e6, 1))
    )
    return rows


def claim2(spark) -> list[tuple]:
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        append_to_ivfpq_index,
        needs_refit,
        save_ivfpq_index,
    )

    rows: list[tuple] = []
    corpus = _skewed_corpus(spark, n=100_000)
    idx = "/tmp/scale_r11_drift/index"
    shutil.rmtree("/tmp/scale_r11_drift", ignore_errors=True)
    save_ivfpq_index(corpus, idx, k=16, m=8, pq_k=16)

    rng = np.random.default_rng(17)
    import pandas as pd

    def batch_df(X, base_id):
        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(base_id, base_id + len(X), dtype=np.int64),
                "embedding": [v.tolist() for v in X.astype(np.float32)],
            }
        )
        return spark.createDataFrame(pdf).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )

    modes = rng.normal(size=(16, DIM)) * 3.0  # NOT the build's seed: held out
    for b in range(3):  # in-distribution epochs (the build's generator)
        rng2 = np.random.default_rng(100 + b)
        m2 = np.random.default_rng(11).normal(size=(16, DIM)) * 3.0
        picks = rng2.integers(0, 16, size=5_000)
        X = m2[picks] + rng2.normal(size=(5_000, DIM)) * 0.6
        t0 = time.time()
        append_to_ivfpq_index(batch_df(X, 10_000_000 + b * 100_000), idx, batch_id=b)
        rows.append((f"in-dist append batch={b} (5k rows; sec)", round(time.time() - t0, 2), ""))
        r = needs_refit(spark, idx, threshold=1.5, recent_batches=1)
        rows.append((f"  needs_refit after batch={b} (ratio / trips)",
                     round(r["ratio"], 4), r["needs_refit"]))

    # planted shift: basis-vector arrivals the codebooks never fit
    basis = np.eye(DIM)[rng.integers(0, DIM, size=5_000)]
    t0 = time.time()
    append_to_ivfpq_index(batch_df(basis, 20_000_000), idx, batch_id=3)
    rows.append(("shifted append batch=3 (5k basis rows; sec)", round(time.time() - t0, 2), ""))
    t0 = time.time()
    r = needs_refit(spark, idx, threshold=1.5, recent_batches=1)
    monitor_s = time.time() - t0
    rows.append(("  needs_refit after shift (ratio / trips)", round(r["ratio"], 4), r["needs_refit"]))
    pooled = needs_refit(spark, idx, threshold=1.5)
    rows.append(("  pooled over all 4 batches (ratio / trips)", round(pooled["ratio"], 4), pooled["needs_refit"]))
    rows.append(("needs_refit driver cost (sec, 4 batch records)", round(monitor_s, 3), ""))
    return rows


def main() -> None:
    which = set(sys.argv[1:]) or {"claim1", "claim2"}
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    all_rows: list[tuple] = []
    if "claim1" in which:
        all_rows += [("— claim 1: PQ-aware split vs full rebuild —", "", "")]
        all_rows += claim1(spark)
    if "claim2" in which:
        all_rows += [("— claim 2: codebook drift monitor —", "", "")]
        all_rows += claim2(spark)
    print("| measurement | a | b |")
    print("|---|---|---|")
    for name, a, b in all_rows:
        print(f"| {name} | {a} | {b} |")


if __name__ == "__main__":
    main()
