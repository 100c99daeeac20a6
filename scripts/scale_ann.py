#!/usr/bin/env python
"""Empirical scale-up check for the ANN paths (SCALE.md evidence).

Generates a synthetic embedding corpus distributively (spark.range +
64 rand() columns — no driver materialization), then times, at each
corpus size:

  - x06 brute-force cosine top-k (the exact baseline: |Q| x |corpus|
    dot products, linear in corpus size per query);
  - x75 PQ pipeline: codebook train (bounded sample) + encode (one
    mapInPandas pass) + ADC search (cogroup, per-bucket argpartition,
    output bounded by |Q| x shortlist x n_batches);
  - x24 IVF: k-means index build + nprobe probe (scans nprobe/k of the
    corpus per query).

The claim under test: approximate-path search cost grows sublinearly vs
brute force as the corpus grows (the 100 TB argument), while build
costs stay bounded (PQ train) or scale like one k-means (IVF).

Usage: python scripts/scale_ann.py [sizes...]   (default 20000 200000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

DIM = 64
N_QUERIES = 100
K = 5


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [20_000, 200_000]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        build_ivf_index,
        encode_pq,
        probe_ivf,
        search_pq,
        train_pq_codebooks,
    )
    from azure_serverless_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for n in sizes:
        emb = (
            spark.range(n)
            .select(
                F.col("id").alias("vec_id"),
                F.array(*[F.rand(seed=i) - F.lit(0.5) for i in range(DIM)])
                .alias("embedding"),
            )
        ).cache()
        emb.count()
        queries = emb.filter(F.col("vec_id") < N_QUERIES)

        def timed(label, thunk, runs=1):
            # runs=3 -> median of 3 after the first (warm-up) for the
            # per-query search paths; build steps are one-shot by nature
            samples = []
            for i in range(runs + (1 if runs > 1 else 0)):
                t0 = time.time()
                out = thunk()
                if out is not None:
                    out.write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            import statistics

            dt = round(statistics.median(samples[1:] if runs > 1 else samples), 2)
            results.append({"n": n, "step": label, "sec": dt})
            print(f"n={n:>7} {label:28s} {dt:7.2f}s", flush=True)
            return dt

        timed("brute cosine_topk", lambda: cosine_topk(emb, queries, k=K),
              runs=3)

        books = None

        def train():
            nonlocal books
            books = train_pq_codebooks(emb, m=8, k=16)
            return None

        timed("pq train (bounded sample)", train)
        encoded = encode_pq(emb, books).cache()
        timed("pq encode (one pass)", lambda: encoded)
        timed(
            "pq ADC search + rerank",
            lambda: search_pq(encoded, emb, queries, books, k=K, shortlist=50),
            runs=3,
        )
        encoded.unpersist()

        ivf_state = {}

        def build():
            ivf_state["indexed"], ivf_state["cent"] = build_ivf_index(
                emb, k=64
            )
            ivf_state["indexed"] = ivf_state["indexed"].cache()
            ivf_state["indexed"].count()
            return None

        timed("ivf build (kmeans k=64)", build)
        timed(
            "ivf probe (nprobe 8/64)",
            lambda: probe_ivf(
                ivf_state["indexed"], queries, ivf_state["cent"], k=K, nprobe=8
            ),
            runs=3,
        )
        ivf_state["indexed"].unpersist()
        emb.unpersist()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
