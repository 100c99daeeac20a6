"""Semantics tests for operators/packing.py (chunking, sequence packing,
mixture sampling) beyond the x67-x69 oracle parity: invariants and the
partitioning-stability property the module docstring promises.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from azure_serverless_etl_pipeline_spark.operators.packing import (
    chunk_documents,
    mixture_sample,
    pack_sequences,
)
from azure_serverless_etl_pipeline_spark.sources import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


def test_chunks_cover_every_token_and_respect_size(spark, docs):
    chunks = chunk_documents(docs, chunk_tokens=32, stride=24).cache()
    rows = chunks.collect()
    assert all(r.chunk_len <= 32 for r in rows)
    # stride walk: chunk c starts at 24·c, and every token index < n_tokens
    # is inside at least one chunk (stride < chunk size -> full coverage)
    assert all(r.chunk_start == 24 * r.chunk_id for r in rows)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in per_doc.values():
        covered = set()
        for r in doc_rows:
            covered.update(range(r.chunk_start, r.chunk_start + r.chunk_len))
        assert covered == set(range(doc_rows[0].n_tokens))
    # overlap reconstruction: dropping the first (32-24)=8 tokens of every
    # non-first chunk and concatenating rebuilds the document exactly
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, doc_rows in per_doc.items():
        doc_rows.sort(key=lambda r: r.chunk_id)
        parts = [doc_rows[0].chunk_text.split()]
        for r in doc_rows[1:]:
            parts.append(r.chunk_text.split()[32 - 24:])
        rebuilt = [t for p in parts for t in p]
        assert rebuilt == texts[doc_id].split()


def test_pack_sequences_budget_and_stability(spark, docs):
    packed = pack_sequences(docs, budget_tokens=256, n_shards=8)
    rows = packed.collect()
    # seq assignment is exactly the start-offset bucket
    assert all(r.seq_id == r.start_offset // 256 for r in rows)
    # offsets are a per-shard exclusive prefix sum in doc_id order
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        acc = by_shard.get(r.shard, 0)
        assert r.start_offset == acc
        by_shard[r.shard] = acc + r.n_tokens
    # partitioning stability: same assignment after a repartition
    repart = pack_sequences(docs.repartition(7), budget_tokens=256, n_shards=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, repart.collect()))


def test_mixture_sample_hits_target_and_is_stable(spark, docs):
    targets = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    kept = mixture_sample(docs, targets).cache()
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= set(targets)
    # the bottleneck source keeps everything (largest w / equal counts)
    n_src0_total = docs.filter(F.col("source") == "src0").count()
    assert counts["src0"] == n_src0_total
    # achieved mixture within hash-quantization of the target (rate has
    # bucket resolution 1/10000, counts are small -> allow a few docs)
    total = sum(counts.values())
    for s, w in targets.items():
        assert abs(counts[s] / total - w) < 0.1
    # deterministic: repartitioned input keeps the same doc_ids
    kept2 = mixture_sample(docs.repartition(5), targets)
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in kept2.collect()
    )


def test_chunking_is_mapside_only(spark, docs):
    plan = io.StringIO()
    with contextlib.redirect_stdout(plan):
        chunk_documents(docs).explain("formatted")
    assert "Exchange" not in plan.getvalue()


def test_mixture_never_shuffles_the_corpus(spark, docs):
    plan = io.StringIO()
    with contextlib.redirect_stdout(plan):
        mixture_sample(docs, {"src0": 0.5, "src1": 0.5}).explain("formatted")
    text = plan.getvalue()
    # the corpus-side join must be broadcast; any sort-merge join would
    # mean the full corpus shuffled on source
    assert "SortMergeJoin" not in text
    assert "BroadcastHashJoin" in text


def test_profile_table_semantics(spark, docs):
    """profile_table on documents: exact metrics + approx mode sanity.
    Approx (HLL) is the DEFAULT — exact COUNT(DISTINCT) multiplies the
    scan |columns|x via Expand, so it is opt-in for oracle parity."""
    from azure_serverless_etl_pipeline_spark.operators.profile import profile_table

    prof = {r.column: r for r in profile_table(docs, approx_distinct=False).collect()}
    n = docs.count()
    assert set(prof) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert all(r.n_rows == n for r in prof.values())
    assert prof["doc_id"].n_distinct == n and prof["doc_id"].n_nulls == 0
    assert prof["lang"].n_distinct == 5
    # string columns range over LENGTH
    import pyspark.sql.functions as F

    lens = docs.select(
        F.min(F.length("text")), F.max(F.length("text"))
    ).first()
    assert (prof["text"].min_val, prof["text"].max_val) == tuple(map(float, lens))
    # approx mode (the default): same shape, HLL cardinalities within 5%
    approx = {r.column: r for r in profile_table(docs).collect()}
    assert set(approx) == set(prof)
    assert abs(approx["doc_id"].n_distinct - n) / n < 0.05


def test_temperature_mixture_properties(spark, docs):
    """Mixture-weight invariants: q is a distribution; alpha=1 is
    proportional (q==p); alpha<1 compresses ratios toward uniform
    (tail strata gain weight, the head loses); keep_rate is capped."""
    import pyspark.sql.functions as F

    from azure_serverless_etl_pipeline_spark.operators.packing import (
        temperature_mixture,
    )

    out = temperature_mixture(docs, ("lang",), alpha=0.7, budget=100).toPandas()
    assert abs(out["p"].sum() - 1.0) < 1e-9
    assert abs(out["q"].sum() - 1.0) < 1e-9
    assert (out["keep_rate"] <= 1.0).all() and (out["keep_rate"] > 0).all()
    assert abs(out["target_n"].sum() - 100) < 1e-3

    prop = temperature_mixture(docs, ("lang",), alpha=1.0, budget=100).toPandas()
    assert (prop["p"] - prop["q"]).abs().max() < 1e-9

    # alpha<1 flattening: smallest stratum gains share, largest loses
    m = out.sort_values("n_docs", ignore_index=True)
    assert m.iloc[0]["q"] >= m.iloc[0]["p"]
    assert m.iloc[-1]["q"] <= m.iloc[-1]["p"]

    uni = temperature_mixture(docs, ("lang",), alpha=0.0, budget=100).toPandas()
    assert uni["q"].std() < 1e-9  # alpha=0 -> uniform over strata


def test_snapshot_diff_null_content(spark):
    """Rows with NULL content must classify by id PRESENCE, not hash
    nullity (md5(NULL) is NULL): NULL->value is changed, NULL absent
    from new is removed, NULL==NULL is unchanged — matching the
    oracle's IS NOT DISTINCT FROM semantics."""
    from azure_serverless_etl_pipeline_spark.operators.profile import (
        snapshot_diff,
    )

    schema = "doc_id long, text string"
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, None), (5, "gone")], schema
    )
    new = spark.createDataFrame(
        [(1, "now-set"), (3, "same"), (4, None), (6, "fresh")], schema
    )
    got = {
        r["status"]: r["n_docs"]
        for r in snapshot_diff(old, new).collect()
    }
    # 1: NULL->value = changed; 2: only in old = removed; 3: unchanged;
    # 4: NULL==NULL = unchanged; 5: removed; 6: added
    assert got == {"changed": 1, "removed": 2, "unchanged": 2, "added": 1}
