"""End-to-end corpus ingest pipeline (north-star composition).

Streaming arrivals -> quality gate -> incremental dedup against the
accumulated store -> deterministic split -> partitioned append. Each
stage is an operator this engine already ships (quality rules = x46,
hash dedup = x45, split = x37); this module is the composition running
under Structured Streaming's exactly-once file source, via foreachBatch
so the dedup stage can read the accumulated store transactionally.

At 100 TB scale: the store is partitioned by split (training jobs read
one subtree), the dedup anti-join touches only the fingerprint column
(scan-pruned), and every per-batch stage is map-side except the
anti-join's hash exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import deterministic_split
from .text import quality_rules_all


def quality_gate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep docs passing the composite quality rules. The rule expressions
    are text.quality_rules — the same columns x46 audits, so gate and
    audit cannot drift."""
    return docs.filter(quality_rules_all(text_col))


def _ingest_batch(batch: DataFrame, store_dir: str) -> None:
    """One micro-batch: gate -> dedup within batch and vs store -> split
    -> append partitioned by split."""
    spark = batch.sparkSession
    staged = (
        quality_gate(batch)
        .withColumn("fp", F.md5(F.col("text")))
        .dropDuplicates(["fp"])
    )
    if os.path.isdir(store_dir) and any(
        not f.startswith(("_", ".")) for f in os.listdir(store_dir)
    ):
        existing = spark.read.parquet(store_dir).select("fp")
        staged = staged.join(existing, "fp", "left_anti")
    out = deterministic_split(staged)
    out.write.mode("append").partitionBy("split").parquet(store_dir)


def run_corpus_pipeline(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema,
) -> None:
    """Drive the pipeline over all files currently in source_dir
    (Trigger.AvailableNow: batch-equivalent result, streaming
    exactly-once bookkeeping; re-runs pick up only new files)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _id: _ingest_batch(b, store_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def prepare_training_corpus(
    docs: DataFrame,
    eval_df: DataFrame,
    target: DataFrame,
    keep_fraction: float = 0.5,
    chunk_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The full batch training-data prep chain as ONE lazy plan:

        quality gate (x46 rules) -> exact dedup (x01, min-id keeps)
        -> benchmark decontamination (x84) -> DSIR top-fraction
        selection against the target corpus (x87) -> fixed-budget
        chunking (x67)

    Every stage is an operator this engine ships individually. The
    chain's consumers FAN OUT (decontamination reads its input twice,
    DSIR reads its input for model counts, scoring and the zero-token
    cover, the final selection joins the clean frame again), and Spark
    shares no subtrees across a DAG — left lazy, the gate+dedup+
    decontam prefix re-executed up to seven times per action (r13
    measured: 15 parquet scans of the corpus in one x99 plan). Each
    stage boundary that is consumed more than once is therefore
    localCheckpoint-ed (eager, computed from the inputs on EVERY
    invocation — per-run work, not cross-run state; the in-storage
    analog of the interstage tables the streaming variant of this
    module writes): the stage prefix now runs exactly once per call
    (guide §1.2 — remove recomputation before tuning anything else).
    Column pruning still reaches the parquet scans inside each stage's
    one evaluation (the checkpointed frames are pre-projected to
    id+text). Returns the chunked frame (id, chunk_id, chunk_text,
    n_tokens per chunk) ready for packing (x68) or writing.

    Stage-equivalence (the composition equals applying the stages one at
    a time) is pytest-asserted, which is what makes refactoring the
    chain safe.
    """
    from concurrent.futures import ThreadPoolExecutor

    from . import decontam, dsir
    from .dedup import exact_dedup
    from .packing import chunk_documents

    gated = quality_gate(docs, text_col)
    # The TARGET-side DSIR bucket counts depend on nothing upstream
    # (the target corpus is an independent input), but they used to be
    # evaluated inside the scores checkpoint — the last link of the
    # serial gate -> dedup -> decontam -> score chain. Tokenize the
    # target on a second driver thread concurrently with the raw-side
    # stage builds (guide §2.6: actions are only sequential because
    # driver code calls them sequentially) and hand the finished
    # statistic to the scorer. Identical counts, identical ratios —
    # the checkpoint only moves WHEN the same plan runs.
    spark = docs.sparkSession
    n_buckets = 1000

    def _target_counts():
        spark.sparkContext.setJobDescription("corpus-prep: target counts")
        return dsir._bucket_counts(
            target, "c_t", n_buckets, text_col
        ).localCheckpoint()

    with ThreadPoolExecutor(max_workers=1) as pool:
        f_tc = pool.submit(_target_counts)
        # exact dedup keeps the min-id representative per distinct text;
        # consumed twice by decontamination (report + anti-join)
        reps = (
            exact_dedup(gated, text_col, id_col)
            .select(id_col, text_col)
            .localCheckpoint()
        )
        # consumed three times: DSIR statistic, DSIR zero-token cover,
        # final selection join
        clean = decontam.decontaminate(
            reps, eval_df, n=5, id_col=id_col, text_col=text_col
        ).localCheckpoint()
        target_counts = f_tc.result()
    spark.sparkContext.setJobDescription(None)
    # consumed twice by select_top_fraction (count + rank window)
    scores = dsir.importance_scores(
        clean,
        target,
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
        target_counts=target_counts,
    ).localCheckpoint()
    picked = dsir.select_top_fraction(scores, keep_fraction, id_col=id_col)
    selected = clean.join(picked.select(id_col), id_col)
    return chunk_documents(selected, chunk_tokens=chunk_tokens)
