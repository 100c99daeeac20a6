"""Streaming sequence packing — the incremental-ingest twin of
operators/packing.pack_sequences.

A training corpus is usually not rebuilt from scratch: new documents
arrive in batches and must extend the existing packed sequences without
reassigning anything already written. That is per-shard running state —
the next free token offset — carried across micro-batches with
``applyInPandasWithState`` (the custom-stateful-operator path; Spark has
no built-in streaming prefix sum).

Contract: within a micro-batch each shard's documents are packed in
doc_id order; across batches, in arrival order. For an append-ordered
corpus (ids grow with ingest time — the incremental case this operator
exists for) the assignment is IDENTICAL to re-running batch
pack_sequences on everything seen so far, verified in
tests/test_pack_stream.py. State is one bigint per shard — bounded by
n_shards, not by corpus size.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions import tokens
from ..operators.sampling import hash_bucket

_STATE = T.StructType([T.StructField("next_offset", T.LongType())])
_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("start_offset", T.LongType()),
        T.StructField("seq_id", T.LongType()),
    ]
)


def _make_packer(budget_tokens: int):
    def _pack(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        off = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "doc_id", ignore_index=True
        )
        n = pdf["n_tokens"].astype("int64")
        starts = off + n.cumsum().shift(fill_value=0)
        state.update((int(off + n.sum()),))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "shard": int(key[0]),
                "n_tokens": n,
                "start_offset": starts.astype("int64"),
                "seq_id": (starts // budget_tokens).astype("int64"),
            }
        )

    return _pack


def pack_sequences_stream(
    stream: DataFrame,
    budget_tokens: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stateful streaming packing: same shard hash and output schema as
    the batch operator; per-shard next-offset state extends sequences
    across micro-batches."""
    sharded = stream.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(F.col(id_col), n_shards).alias("shard"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _make_packer(budget_tokens),
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
