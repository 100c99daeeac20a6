"""Scale evidence for the training-sequence assembly operators (SCALE.md).

Generates synthetic corpora distributively (spark.range + deterministic
hash-derived token counts, ~40-token docs) at 1M and 5M documents and
measures chunk_documents / pack_sequences / mixture_sample wall time,
verifying the linearity and plan-shape claims in operators/packing.py:
chunking shuffles nothing, packing shuffles once (shard), mixture never
shuffles the corpus.

Run: python scripts/scale_packing.py   (prints a markdown table)
"""

from __future__ import annotations

import contextlib
import io
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

VOCAB = [f"w{i}" for i in range(50)]


def build_corpus(spark: SparkSession, n_docs: int):
    """Deterministic ~40-token docs over a 50-word vocab, 20 sources."""
    words = F.array(*[F.lit(w) for w in VOCAB])
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
    )
    tok = F.transform(
        F.sequence(F.lit(1), (F.xxhash64("doc_id") % 21 + 30)),
        lambda i: F.element_at(
            words, (F.pmod(F.xxhash64(F.col("doc_id") * 1000 + i), 50) + 1).cast("int")
        ),
    )
    return df.select("doc_id", "source", F.array_join(tok, " ").alias("text"))


def timed(label: str, df) -> float:
    """Time a full materialization via the noop sink: count() lets
    Catalyst prune every unreferenced computed column (the pack window,
    the chunk slices), which under-measures map-side operators."""
    n = df.count()  # warm-up (and row count for the table)
    df.write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"| {label} | {dt:.2f} | {n:,} |")
    return dt


def exchanges(df, shuffle_only: bool = False) -> int:
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    if shuffle_only:  # distinct plain shuffle nodes (a cached subtree is
        # printed once per reference; same node id = same exchange)
        return len(set(re.findall(r"[+:]- Exchange \((\d+)\)", buf.getvalue())))
    return buf.getvalue().count("Exchange")


def main() -> None:
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from azure_serverless_etl_pipeline_spark.operators.packing import (
        chunk_documents,
        mixture_sample,
        pack_sequences,
    )
    from azure_serverless_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale_packing")
    targets = {f"src{i}": w for i, w in enumerate((0.3, 0.2, 0.2, 0.15, 0.15))}

    print("| operator @ n_docs | sec | rows out |")
    print("|---|---|---|")
    for n_docs in (1_000_000, 5_000_000):
        corpus = build_corpus(spark, n_docs).cache()
        corpus.count()
        chunked = chunk_documents(corpus, chunk_tokens=32, stride=24)
        packed = pack_sequences(corpus, budget_tokens=2048, n_shards=64)
        mixed = mixture_sample(corpus, targets)
        assert exchanges(chunked) == 0, "chunking must be map-side only"
        assert exchanges(mixed.select("doc_id"), shuffle_only=True) <= 2, (
            "mixture may shuffle only the tiny counts/scale aggs, not the corpus"
        )
        timed(f"chunk_documents @ {n_docs:,}", chunked)
        timed(f"pack_sequences @ {n_docs:,}", packed)
        timed(f"mixture_sample @ {n_docs:,}", mixed)
        corpus.unpersist()


if __name__ == "__main__":
    main()
