"""Stream/batch parity for the stateful streaming sequence packer: on an
append-ordered corpus the per-shard next-offset state must reproduce the
batch assignment exactly, across multiple micro-batches and across a
query restart from the checkpoint.
"""

from __future__ import annotations

import pandas as pd
import pytest

from azure_serverless_etl_pipeline_spark.operators.packing import pack_sequences
from azure_serverless_etl_pipeline_spark.sources import load_table
from azure_serverless_etl_pipeline_spark.streaming.pack_stream import (
    pack_sequences_stream,
)
from tests.conftest import SF_SMOKE

BUDGET, SHARDS = 256, 8


@pytest.fixture(scope="module")
def doc_batches(spark, tmp_path_factory):
    """documents split into 3 doc_id-ordered parquet files (the
    append-ordered ingest case) + the full batch frame."""
    d = tmp_path_factory.mktemp("pack_src")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    parts = [
        docs.filter(docs.doc_id < cuts[0]),
        docs.filter((docs.doc_id >= cuts[0]) & (docs.doc_id < cuts[1])),
        docs.filter(docs.doc_id >= cuts[1]),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(str(d / f"batch{i}"))
    return d, docs


def _drain(spark, stream_df, ckpt, out_dir):
    """foreachBatch parquet-append sink: unlike the memory sink it can
    resume from a checkpoint (cross-restart state recovery)."""

    def sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values("doc_id", ignore_index=True)[
        ["doc_id", "shard", "n_tokens", "start_offset", "seq_id"]
    ].astype("int64")


def test_stream_pack_matches_batch_across_batches(spark, doc_batches, tmp_path):
    """Feed the 3 ordered files one micro-batch at a time; the union of
    emitted assignments must equal batch pack_sequences on the whole
    corpus (same shard hash, same offsets, same seq ids)."""
    d, docs = doc_batches
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(str(d / "batch0")).schema

    import shutil

    out = str(tmp_path / "out")
    for i in range(3):
        for f in (d / f"batch{i}").glob("*.parquet"):
            shutil.copy(f, src / f"b{i}.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        _drain(spark, pack_sequences_stream(stream, BUDGET, SHARDS), ckpt, out)
    got = _canon(spark.read.parquet(out).toPandas())
    expected = _canon(pack_sequences(docs, BUDGET, SHARDS).toPandas())
    pd.testing.assert_frame_equal(got, expected)
    # each doc emitted exactly once across all micro-batches
    assert got["doc_id"].is_unique


def test_stream_pack_state_survives_restart(spark, doc_batches, tmp_path):
    """Stop after batch 0, start a NEW query on the same checkpoint for
    batches 1-2: offsets must continue from the recovered state."""
    d, docs = doc_batches
    src = tmp_path / "src2"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt2")
    schema = spark.read.parquet(str(d / "batch0")).schema

    import shutil

    out = str(tmp_path / "out2")
    for f in (d / "batch0").glob("*.parquet"):
        shutil.copy(f, src / "b0.parquet")
    stream = spark.readStream.schema(schema).parquet(str(src))
    _drain(spark, pack_sequences_stream(stream, BUDGET, SHARDS), ckpt, out)

    for i in (1, 2):
        for f in (d / f"batch{i}").glob("*.parquet"):
            shutil.copy(f, src / f"b{i}.parquet")
    stream2 = spark.readStream.schema(schema).parquet(str(src))
    _drain(spark, pack_sequences_stream(stream2, BUDGET, SHARDS), ckpt, out)

    got = _canon(spark.read.parquet(out).toPandas())
    expected = _canon(pack_sequences(docs, BUDGET, SHARDS).toPandas())
    pd.testing.assert_frame_equal(got, expected)
