"""Streaming incremental dedup (streaming/dedup_stream): the folded
cluster map after draining N micro-batches must equal the one-shot
batch run over everything, and re-folding a batch must be idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F


def _truth(docs):
    from azure_serverless_etl_pipeline_spark.operators.dedup import (
        dup_clusters,
        ngram_jaccard_pairs,
    )

    m = dup_clusters(
        ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_freq=50)
    ).toPandas()
    return dict(zip(m["doc_id"], m["cluster_id"]))


def test_stream_folds_to_batch_truth(spark, tmp_path):
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        current_map,
        start_dedup_stream,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    landing = str(tmp_path / "landing")
    # three arrival files; maxFilesPerTrigger=1 -> three micro-batches
    for part in range(3):
        docs.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    q = start_dedup_stream(
        spark,
        landing,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    got = current_map(spark, str(tmp_path / "state")).toPandas()
    got_map = dict(zip(got["doc_id"], got["cluster_id"]))
    assert got_map == _truth(docs)


def test_fold_batch_is_idempotent(spark, tmp_path):
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        current_map,
        fold_batch,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    fold_batch(spark, b0, 0, state)
    fold_batch(spark, b1, 1, state)
    want = current_map(spark, state).toPandas()
    want_map = dict(zip(want["doc_id"], want["cluster_id"]))

    # crash-rerun of the LAST batch: same inputs, same batch id — the
    # overwrite-keyed layout must land on the identical map
    fold_batch(spark, b1, 1, state)
    got = current_map(spark, state).toPandas()
    got_map = dict(zip(got["doc_id"], got["cluster_id"]))
    assert got_map == want_map == _truth(docs)
