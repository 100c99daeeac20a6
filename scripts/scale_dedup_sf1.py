#!/usr/bin/env python
"""Round-6 scale evidence: the dedup chain + persisted IVF probe at an
sf1-equivalent slice (10x the sf0.1 documents/embeddings tables),
recording wall-clock AND shuffle-bytes ratios vs sf0.1 (SCALE.md).

The slice is DERIVED from the driver-provided sf0.1 tables (never
synthesized from nothing): replica 0 is the original corpus verbatim
(organic duplicate structure preserved); replicas 1..9 shift ids and
deterministically permute each document's word order (sort by
xxhash64(word || replica)) so their 3-gram shingle sets are fresh —
intra-replica duplicate structure survives (identical texts permute
identically), cross-replica texts stay below the Jaccard threshold.
That models organic 10x growth: pair density grows ~linearly, not
quadratically (10 exact copies of every doc would plant 45-edge
cliques corpus-wide and measure a different workload). Embeddings
replicate with a per-replica circular rotation (norm-preserving, keeps
the label blocking structure).

Run: python scripts/scale_dedup_sf1.py [--skip-pathology]
(prints the markdown table; the machine must be otherwise idle — the
numbers are wall-clock medians-of-one on shared cores, and a
concurrent pytest session was measured to inflate them up to 10x)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"
OUT = "/tmp/sf1_slice"
REPLICAS = 10


def get_spark_ui():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")  # shuffle-bytes accounting
        .getOrCreate()
    )


def shuffle_bytes(sc) -> int:
    ui, app = sc.uiWebUrl, sc.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def generate(spark) -> None:
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select("doc_id", "text")
    parts = []
    for k in range(REPLICAS):
        if k == 0:
            parts.append(docs)
            continue
        words = F.split(F.col("text"), " ")
        # salt the permutation with the DOC ID, not just the replica: a
        # per-replica-only salt sorts every doc by one global word order
        # (a canonical-ordering pathology — all docs share their
        # smallest-hash word triples as shingles, which collapses LSH
        # banding into mega-buckets; kept available below as the planted
        # pathology for the guard measurement)
        salt = F.concat(F.lit(f"r{k}:"), F.col("doc_id").cast("string"), F.lit(":"))
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
    d.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    eparts = []
    for k in range(REPLICAS):
        if k == 0:
            eparts.append(emb.select("vec_id", "embedding", "label"))
            continue
        rot = F.concat(
            F.slice(F.col("embedding"), k + 1, 64 - k),
            F.slice(F.col("embedding"), 1, k),
        )
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
    e.repartition(8).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")


def run_chain(spark, docs_path: str, emb_path: str, state_root: str) -> dict:
    """Time the dedup chain + IVF probe once; return {name: (sec, shuffle_mb, rows)}."""
    from azure_serverless_etl_pipeline_spark.operators import ann_index
    from azure_serverless_etl_pipeline_spark.operators.dedup import (
        incremental_dup_clusters,
        materialize_incremental_state,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_incremental_indexed,
    )

    sc = spark.sparkContext
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    emb = spark.read.parquet(emb_path)
    out: dict[str, tuple] = {}

    def timed(name, thunk):
        spark.catalog.clearCache()
        s0, t0 = shuffle_bytes(sc), time.time()
        rows = thunk()
        sec = time.time() - t0
        out[name] = (round(sec, 2), (shuffle_bytes(sc) - s0) >> 20, rows)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        return None

    timed("x02 ngram-jaccard pairs", lambda: ngram_jaccard_pairs(
        docs, threshold=0.5, max_shingle_freq=50).count())
    # x03's registered configuration: threshold-calibrated banding
    # ((1/16)^(1/4) = 0.5) + the mega-bucket guard
    timed("x03 minhash-LSH pairs (r=4 b=16 cap=200)", lambda: minhash_lsh_pairs(
        docs, threshold=0.5, num_perm=64, bands=16, max_bucket_size=200).count())

    # x117b shape: materialize 95% (setup, untimed), fold the 5% batch
    old = docs.filter(F.col("doc_id") % 20 != 19)
    new = docs.filter(F.col("doc_id") % 20 == 19)
    state = f"{state_root}/inc_state"
    materialize_incremental_state(old, state, threshold=0.5, max_shingle_freq=50)
    old_base = spark.read.parquet(f"{state}/old_base")
    old_df = spark.read.parquet(f"{state}/shingle_df")
    old_map = spark.read.parquet(f"{state}/old_map")

    def fold():
        inc = ngram_jaccard_pairs_incremental_indexed(
            new, old_base, old_df, threshold=0.5, max_shingle_freq=50
        )
        noop(incremental_dup_clusters(old_map, inc))

    timed("x117b incremental fold (5% batch)", fold)

    # persisted IVF probe: build (setup, untimed), probe 100 queries at
    # nprobe=2 — dynamic partition pruning should keep the scan at
    # ~2/16ths of the index regardless of corpus size
    idx = f"{state_root}/ivf"
    ann_index.save_ivf_index(emb, idx, k=16)
    indexed, centroids = ann_index.load_ivf_index(spark, idx)
    queries = emb.filter(F.col("vec_id") % 10_000_000 < 100)
    timed("x125 IVF probe (100 q, nprobe=2)", lambda: noop(
        ann_index.probe_ivf(indexed, queries, centroids, k=5, nprobe=2)))
    return out


def pathology(spark) -> None:
    """Planted boilerplate pathology: replica permutations salted by
    replica ONLY (every doc sorted by one global word order -> shared
    smallest-hash shingles -> LSH mega-buckets). Measures the candidate
    blow-up unguarded vs with the max_bucket_size guard."""
    from azure_serverless_etl_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet").select("doc_id", "text")

    # geometry comparison on the ORGANIC slice first: the corpus's
    # pairwise-similarity noise floor (~J 0.05 from the tiny vocab)
    # makes r=2 banding non-selective — candidate volume goes quadratic
    # even with the bucket cap; r=4 places the S-curve at the 0.5
    # threshold and restores near-linear behavior.
    big = spark.read.parquet(f"{OUT}/documents.parquet").select("doc_id", "text")
    sc = spark.sparkContext
    print("\n## Band geometry at the 10x slice (threshold 0.5)")
    for label, kw in (
        ("r=2 b=32 cap=200", {"bands": 32, "max_bucket_size": 200}),
        ("r=4 b=16 cap=200", {"bands": 16, "max_bucket_size": 200}),
    ):
        spark.catalog.clearCache()
        s0, t0 = shuffle_bytes(sc), time.time()
        npairs = minhash_lsh_pairs(big, threshold=0.5, num_perm=64, **kw).count()
        print(
            f"  {label}: {time.time() - t0:.1f}s, "
            f"{(shuffle_bytes(sc) - s0) >> 20} MB shuffle, {npairs} pairs"
        )

    parts = [docs]
    for k in range(1, REPLICAS):
        words = F.split(F.col("text"), " ")
        salt = F.lit(f"r{k}:")
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
                F.array_join(F.transform(perm, lambda s: s["w"]), " ").alias("text"),
            )
        )
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d = d.repartition(32).cache()
    d.count()
    sc = spark.sparkContext
    print("\n## Boilerplate pathology (50k docs, canonical-order replicas)")
    for label, kw in (("unguarded", {}), ("max_bucket_size=200", {"max_bucket_size": 200})):
        spark.catalog.clearCache()
        d.cache().count()
        s0, t0 = shuffle_bytes(sc), time.time()
        npairs = minhash_lsh_pairs(d, threshold=0.5, **kw).count()
        print(
            f"  {label}: {time.time() - t0:.1f}s, "
            f"{(shuffle_bytes(sc) - s0) >> 20} MB shuffle, {npairs} pairs"
        )
    d.unpersist()


def main() -> None:
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    generate(spark)
    print(f"generated {OUT} in {time.time() - t0:.0f}s")
    for p in ("documents", "embeddings"):
        n = spark.read.parquet(f"{OUT}/{p}.parquet").count()
        print(f"  {p}: {n} rows")

    # warm the JIT so both scales measure steady-state (x89 lesson)
    base = run_chain(spark, f"{SF01}/documents.parquet",
                     f"{SF01}/embeddings.parquet", "/tmp/sf1_scale_base_warm")
    base = run_chain(spark, f"{SF01}/documents.parquet",
                     f"{SF01}/embeddings.parquet", "/tmp/sf1_scale_base")
    big = run_chain(spark, f"{OUT}/documents.parquet",
                    f"{OUT}/embeddings.parquet", "/tmp/sf1_scale_big")

    print("\n| plan | sf0.1 sec | sf1 sec | time x | sf0.1 shuf MB | sf1 shuf MB | shuf x |")
    print("|---|---|---|---|---|---|---|")
    for name in base:
        bs, bm, _ = base[name]
        gs, gm, _ = big[name]
        print(
            f"| {name} | {bs} | {gs} | {gs / bs:.1f} | {bm} | {gm} | "
            f"{(gm / bm):.1f} |" if bm else
            f"| {name} | {bs} | {gs} | {gs / bs:.1f} | {bm} | {gm} | — |"
        )
    if "--skip-pathology" not in sys.argv:
        pathology(spark)


if __name__ == "__main__":
    main()
