#!/usr/bin/env python
"""Round-13 operator-scale evidence (VERDICT r12 items 1 + 3a).

Claim 1 — the error-WEIGHTED codes-only refit rescues the minority
mixture the uniform refit measurably could not: round 12's honest limit
was the 9%-mixture scenario (200k skewed corpus + 20k planted basis
batch) reading 4.08 after the uniform refit — still over the 1.5
threshold. Same corpus, same planted shift, same cadence; the A/B is
refit_pq_codebooks(weight_by_error=False) vs (=True), each on its own
identically-built index, scored by the drift ratio of a FRESH shifted
batch appended after the refit.

Claim 2 — compaction candidate discovery is bounded by the dirty set:
after K appends to a standing index, the bounded pass must examine only
the touched leaves (dirs grows with the batch's landing cells, not the
standing index), and its discovery cost must not grow when the standing
index grows 4x. full=True (the census escape hatch) prices what every
call used to pay.

Run on an otherwise idle machine:
    python scripts/scale_round13_ops.py
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


def get_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def _frame(spark, X, id_base):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(id_base, id_base + len(X), dtype=np.int64),
            "embedding": [v.tolist() for v in X.astype(np.float32)],
        }
    )
    return (
        spark.createDataFrame(pdf)
        .select(
            "vec_id",
            F.col("embedding").cast("array<float>").alias("embedding"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )


def _skewed_corpus(spark, n=200_000, hot_frac=0.15, seed=11):
    """The round-11/12 two-hot-mode synthetic corpus, reused verbatim so
    the weighted-refit numbers are directly comparable with SCALE.md
    round 12's uniform-refit table."""
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
    return _frame(spark, X, 0)


def _basis_batch(spark, n=20_000, id_base=10_000_000, offset=0):
    basis = np.eye(DIM)[(np.arange(n) + offset) % DIM]
    return _frame(spark, basis, id_base)


def claim1(spark) -> None:
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        append_to_ivfpq_index,
        needs_refit,
        refit_pq_codebooks,
        save_ivfpq_index,
    )

    corpus = _skewed_corpus(spark)
    shifted = _basis_batch(spark)
    fresh = _basis_batch(spark, id_base=11_000_000, offset=7)

    print("\n== claim 1: weighted vs uniform refit at the 9% mixture ==")
    rows = []
    for tag, weighted in (("uniform", False), ("weighted", True)):
        idx = f"/tmp/scale_r13_refit_{tag}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        save_ivfpq_index(corpus, idx, k=16, m=8, pq_k=16)
        build_s = time.time() - t0
        append_to_ivfpq_index(shifted, idx, batch_id=0)
        before = needs_refit(spark, idx, recent_batches=1)["ratio"]
        t0 = time.time()
        refit_pq_codebooks(spark, idx, weight_by_error=weighted)
        refit_s = time.time() - t0
        append_to_ivfpq_index(fresh, idx, batch_id=1)
        after = needs_refit(spark, idx, recent_batches=1)["ratio"]
        rows.append((tag, build_s, before, refit_s, after))
        print(
            f"{tag:9s} | build {build_s:6.1f}s | ratio before refit "
            f"{before:6.2f} | refit {refit_s:6.1f}s | fresh-shifted "
            f"ratio after {after:6.2f} | trips@1.5={after > 1.5}"
        )
        shutil.rmtree(idx, ignore_errors=True)
    u, w = rows[0][4], rows[1][4]
    print(f"weighted/uniform post-refit ratio: {w:.2f} vs {u:.2f}")


def claim2(spark) -> None:
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        append_to_ivfpq_index,
        compact_ivf_index,
        save_ivfpq_index,
    )

    print("\n== claim 2: dirty-bounded compaction discovery ==")
    print("standing | appends since compact | mode | dirs | sec")
    for n_standing, seed in ((200_000, 21), (800_000, 22)):
        idx = f"/tmp/scale_r13_compact_{n_standing}"
        shutil.rmtree(idx, ignore_errors=True)
        rng = np.random.default_rng(seed)
        save_ivfpq_index(
            _frame(spark, rng.normal(size=(n_standing, DIM)), 0),
            idx, k=64, m=8, pq_k=16,
        )
        compact_ivf_index(spark, idx)  # consume the build census
        for b in range(4):
            append_to_ivfpq_index(
                _frame(
                    spark,
                    rng.normal(size=(5_000, DIM)),
                    10_000_000 + b * 5_000,
                ),
                idx,
                batch_id=b,
            )
        t0 = time.time()
        rep = compact_ivf_index(spark, idx)
        bounded_s = time.time() - t0
        print(
            f"{n_standing:8d} | 4 x 5k | {rep['mode']:6s} | "
            f"{rep['dirs']:4d} | {bounded_s:6.1f}"
        )
        t0 = time.time()
        rep_f = compact_ivf_index(spark, idx, full=True)
        full_s = time.time() - t0
        print(
            f"{n_standing:8d} | (same, full=True)     | "
            f"{rep_f['mode']:6s} | {rep_f['dirs']:4d} | {full_s:6.1f}"
        )
        shutil.rmtree(idx, ignore_errors=True)


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    claim1(spark)
    claim2(spark)


if __name__ == "__main__":
    main()
