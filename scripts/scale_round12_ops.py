#!/usr/bin/env python
"""Round-12 scale evidence, two claims measured (SCALE.md):

1. CODES-ONLY PQ REFIT vs FULL REBUILD (VERDICT r11 item 1): the only
   remedy for a tripped needs_refit used to be save_ivfpq_index over
   the live corpus — a k-means refit + full-corpus re-encode + full
   rewrite of BOTH tiers (round-11 A/B: 30.85 s / 54.5 MB at 200k x 64).
   refit_pq_codebooks sample-fits new subcodebooks and rewrites ONLY
   the 8-byte codes tier (staged swap; cells/centroids untouched).
   Measured on the same skewed 200k x 64 corpus + a drifted append:
   wall + bytes written for refit vs rebuild — the write side should
   shrink by roughly the full-vector/code byte ratio.

2. RESIDUAL SPLIT RE-ENCODE COST (VERDICT r11 item 4): a raw-codes
   split RELOCATES the hot cells' code rows; a residual split must
   RE-ENCODE them (codes are valid only against their cell's centroid).
   Both are bounded by the hot cells — measured: split wall + written
   MB on twin raw/residual indexes of the same skewed corpus, same
   occupancy target. The recall win residual buys at equal budget is
   RECALL.md's round-12 A/B (scripts/recall.py).

Run on an otherwise idle machine:
    python scripts/scale_round12_ops.py [claim1 claim2]
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


def _skewed_corpus(spark, n=200_000, hot_frac=0.15, seed=11):
    """The round-11 two-hot-mode synthetic corpus (scale_round11_ops),
    reused so the refit/rebuild numbers are directly comparable with
    the round-11 split/rebuild table."""
    rng = np.random.default_rng(seed)
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
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.tolist() for v in X.astype(np.float32)],
        }
    )
    return (
        spark.createDataFrame(pdf)
        .select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )


def _drifted_batch(spark, n=20_000, id_base=10_000_000):
    """Arrivals off the build distribution: unit mass on one dim (the
    drift-monitor test's planted-shift shape, at scale)."""
    import pandas as pd

    basis = np.eye(DIM)[np.arange(n) % DIM]
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(id_base, id_base + n, dtype=np.int64),
            "embedding": [v.tolist() for v in basis.astype(np.float32)],
        }
    )
    return (
        spark.createDataFrame(pdf)
        .select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        .repartition(8)
        .localCheckpoint(eager=True)
    )


def claim1(spark) -> list[tuple]:
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        append_to_ivfpq_index,
        needs_refit,
        refit_pq_codebooks,
        save_ivfpq_index,
        search_ivfpq,
    )

    sc = spark.sparkContext
    rows: list[tuple] = []
    corpus = _skewed_corpus(spark)
    queries = corpus.limit(20).localCheckpoint(eager=True)
    root = "/tmp/scale_r12_refit"
    idx = f"{root}/index"
    shutil.rmtree(root, ignore_errors=True)

    t0 = time.time()
    save_ivfpq_index(corpus, idx, k=16, m=8, pq_k=16)
    rows.append(("initial build (k-means + encode + write)",
                 round(time.time() - t0, 2), ""))
    append_to_ivfpq_index(_drifted_batch(spark), idx, batch_id=0)
    trip = needs_refit(spark, idx, threshold=1.5, recent_batches=1)
    rows.append(("drift ratio after planted 20k batch (trips >1.5)",
                 round(trip["ratio"], 2), trip["needs_refit"]))

    def probe(tag):
        b0, t0 = input_bytes(sc), time.time()
        n = search_ivfpq(spark, idx, queries, k=5, nprobe=2, shortlist=50).count()
        rows.append(
            (f"probe nprobe=2 {tag} (sec / input MB)",
             round(time.time() - t0, 2),
             round((input_bytes(sc) - b0) / 1e6, 1))
        )
        assert n > 0

    probe("BEFORE refit")

    t0, o0 = time.time(), output_bytes(sc)
    out = refit_pq_codebooks(spark, idx)
    refit_s, refit_mb = time.time() - t0, (output_bytes(sc) - o0) / 1e6
    rows.append(
        (f"refit_pq_codebooks (codes tier only, n={out['n']}; "
         "sec / written MB)", round(refit_s, 2), round(refit_mb, 1))
    )
    after = needs_refit(spark, idx, threshold=1.5)
    rows.append(("drift records after refit (reset)", after["n_batches"], ""))
    append_to_ivfpq_index(
        _drifted_batch(spark, id_base=20_000_000), idx, batch_id=1
    )
    post = needs_refit(spark, idx, threshold=1.5, recent_batches=1)
    rows.append(("drift ratio of a NEW shifted batch post-refit",
                 round(post["ratio"], 2), post["needs_refit"]))
    probe("AFTER refit")

    # the old escape at the same state: full rebuild over the live corpus
    live = corpus.unionByName(_drifted_batch(spark)).localCheckpoint(
        eager=True
    )
    idx2 = f"{root}/rebuild"
    t0, o0 = time.time(), output_bytes(sc)
    save_ivfpq_index(live, idx2, k=16, m=8, pq_k=16)
    rows.append(
        ("full save_ivfpq_index rebuild (the old remedy; sec / written MB)",
         round(time.time() - t0, 2),
         round((output_bytes(sc) - o0) / 1e6, 1))
    )
    shutil.rmtree(root, ignore_errors=True)
    return rows


def claim2(spark) -> list[tuple]:
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivfpq_index,
        split_cells,
    )

    sc = spark.sparkContext
    rows: list[tuple] = []
    corpus = _skewed_corpus(spark)
    root = "/tmp/scale_r12_ressplit"
    shutil.rmtree(root, ignore_errors=True)

    for tag, residual in (("raw", False), ("residual", True)):
        idx = f"{root}/{tag}"
        save_ivfpq_index(corpus, idx, k=16, m=8, pq_k=16, residual=residual)
        occ = (
            spark.read.parquet(f"{idx}/cells")
            .groupBy("cell")
            .count()
            .toPandas()["count"]
        )
        target = int(1.5 * occ.median())
        t0, o0 = time.time(), output_bytes(sc)
        n_split = 0
        for _ in range(8):
            c = split_cells(spark, idx, target_occupancy=target).count()
            n_split += c
            if c == 0:
                break
        rows.append(
            (f"{tag} split to occupancy<={target} ({n_split} cells; "
             "sec / written MB)",
             round(time.time() - t0, 2),
             round((output_bytes(sc) - o0) / 1e6, 1))
        )
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
        rows.append((f"{tag} codes/cells disagreement after split", mism, ""))
    shutil.rmtree(root, ignore_errors=True)
    return rows


def main() -> None:
    which = set(sys.argv[1:]) or {"claim1", "claim2"}
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in ("claim1", "claim2"):
        if name not in which:
            continue
        rows = globals()[name](spark)
        print(f"\n== {name} ==")
        for r in rows:
            print(" | ".join(str(x) for x in r))


if __name__ == "__main__":
    main()
