"""Streaming vector ingestion into the persisted IVF index
(streaming/vector_stream): per-epoch idempotent appends, a live-index
reader serving exactly-once across tiers, and a crash-safe fold that
merges the append tier into the cell-partitioned standing tier."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture()
def corpus(spark):
    from azure_serverless_etl_pipeline_spark.sources import load_table

    return load_table(spark, SF_ORACLE, "embeddings")


def _ids(df):
    return {r.vec_id for r in df.select("vec_id").collect()}


def test_stream_appends_fold_and_probe_equal_brute_force(
    spark, corpus, tmp_path
):
    """E2E: build the index on 70% of the corpus, stream the remaining
    30% in three arrival files (fold_every=2 -> one mid-stream fold),
    then probe the LIVE index with nprobe == k — must equal brute-force
    cosine top-k over the whole corpus."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        probe_ivf,
        save_ivf_index,
    )
    from azure_serverless_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        fold_appends,
        load_live_index,
        start_vector_ingest_stream,
    )

    idx = str(tmp_path / "index")
    landing = str(tmp_path / "landing")
    base = corpus.filter(F.col("vec_id") % 10 < 7)
    arriving = corpus.filter(F.col("vec_id") % 10 >= 7)
    save_ivf_index(base, idx, k=8)

    for part in range(3):
        arriving.filter(F.col("vec_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    q = start_vector_ingest_stream(
        spark, landing, idx, str(tmp_path / "ckpt"), fold_every=2
    )
    q.awaitTermination(300)

    live = load_live_index(spark, idx)
    assert _ids(live) == _ids(corpus)
    assert live.count() == corpus.count()

    import numpy as np

    rows = (
        spark.read.parquet(f"{idx}/centroids").orderBy("cell").collect()
    )
    centroids = np.vstack([np.asarray(r.centroid) for r in rows])
    queries = corpus.filter(F.col("vec_id") < 10)
    got = probe_ivf(live, queries, centroids, k=5, nprobe=8).toPandas()
    want = cosine_topk(corpus, queries, k=5).toPandas()
    key = lambda df: sorted(
        map(
            tuple,
            df[["query_id", "neighbor_id", "rank"]].values.tolist(),
        )
    )
    assert key(got) == key(want)

    # final fold drains the append tier entirely; the live index then
    # IS the standing tier, and nothing changes for readers
    fold_appends(spark, idx)
    assert not glob.glob(f"{idx}/appends/batch=*")
    refolded = load_live_index(spark, idx)
    assert _ids(refolded) == _ids(corpus)


@pytest.mark.slow
def test_ivfpq_stream_ingest_with_split_maintenance(spark, corpus, tmp_path):
    """E2E for the IVFADC stream mode (verdict r10 item 3): build the
    two-tier index on 70% of the corpus, stream the remaining 30% in
    three arrival files with ``ivfpq=True`` and split maintenance on
    the fold cadence — every epoch must land in BOTH tiers exactly
    once, the split must keep codes co-partitioned with their vectors,
    and a full probe (nprobe == k', shortlist == |corpus|) must equal
    brute-force cosine top-k over the whole corpus."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        load_ivf_index,
        save_ivfpq_index,
        search_ivfpq,
    )
    from azure_serverless_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        start_vector_ingest_stream,
    )

    idx = str(tmp_path / "index")
    landing = str(tmp_path / "landing")
    base = corpus.filter(F.col("vec_id") % 10 < 7)
    arriving = corpus.filter(F.col("vec_id") % 10 >= 7)
    save_ivfpq_index(base, idx, k=4, m=8, pq_k=16)
    k_before = spark.read.parquet(f"{idx}/centroids").count()

    for part in range(3):
        arriving.filter(F.col("vec_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    target = max(2, corpus.count() // 8)
    q = start_vector_ingest_stream(
        spark,
        landing,
        idx,
        str(tmp_path / "ckpt"),
        fold_every=2,
        split_occupancy=target,
        ivfpq=True,
        compact_every=2,
    )
    q.awaitTermination(300)

    cells = spark.read.parquet(f"{idx}/cells").withColumn(
        "cell", F.col("cell").cast("int")
    )
    codes = spark.read.parquet(f"{idx}/codes").withColumn(
        "cell", F.col("cell").cast("int")
    )
    assert _ids(cells) == _ids(corpus)
    assert cells.count() == codes.count() == corpus.count()
    # tiers agree per id — the split relocated codes with their vectors
    mism = (
        codes.select("vec_id", F.col("cell").alias("code_cell"))
        .join(cells.select("vec_id", "cell"), "vec_id")
        .filter(F.col("code_cell") != F.col("cell"))
        .count()
    )
    assert mism == 0
    # no append tier in this mode; no leftover txn/manifest
    assert not glob.glob(f"{idx}/appends/batch=*")
    assert not os.path.exists(f"{idx}/append_txn")
    assert not os.path.exists(f"{idx}/codes/_split_pending.json")
    # split maintenance actually grew the codebook and met the target
    _, cents = load_ivf_index(spark, idx)
    assert cents.shape[0] > k_before
    occ = cells.groupBy("cell").count()
    assert occ.filter(F.col("count") > target).count() == 0

    queries = corpus.filter(F.col("vec_id") < 10)
    got = (
        search_ivfpq(
            spark, idx, queries, k=5, nprobe=cents.shape[0],
            shortlist=corpus.count(),
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    want = (
        cosine_topk(corpus, queries, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert got.equals(want[got.columns])


def test_fold_refuses_flat_appends_on_ivfpq_index(spark, corpus, tmp_path):
    """Folding the FLAT append tier into an IVFADC index would land
    rows in cells/ that the codes tier never received — invisible to
    every ADC shortlist. fold_appends must refuse while there is
    something to fold, and stay a no-op (so delete_from_live_index's
    fold-first composition keeps working) when the tier is empty."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivfpq_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        fold_appends,
    )

    idx = str(tmp_path / "index")
    base = corpus.filter(F.col("vec_id") % 10 < 8)
    save_ivfpq_index(base, idx, k=4, m=8, pq_k=16)
    assert fold_appends(spark, idx) == {"folded_batches": 0, "affected_cells": 0}
    append_batch(spark, corpus.filter(F.col("vec_id") % 10 >= 8), 0, idx)
    with pytest.raises(ValueError, match="PQ codes tier"):
        fold_appends(spark, idx)


def test_append_epochs_are_idempotent(spark, corpus, tmp_path):
    """Re-delivering the same epoch (a foreachBatch replay) must leave
    exactly one copy of each vector in the live index."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivf_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        load_live_index,
    )

    idx = str(tmp_path / "index")
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    batch = corpus.filter(F.col("vec_id") % 2 == 1)
    save_ivf_index(base, idx, k=8)
    append_batch(spark, batch, 0, idx)
    append_batch(spark, batch, 0, idx)  # replayed epoch
    live = load_live_index(spark, idx)
    assert live.count() == corpus.count()
    assert live.groupBy("vec_id").count().filter("count > 1").count() == 0


def test_fold_crash_window_stays_exactly_once(spark, corpus, tmp_path):
    """Simulate the fold's post-commit / pre-delete crash: the cells
    rewrite landed but the folded append dirs (and the delete manifest)
    are still on disk. The reader must still serve each id exactly
    once, and the NEXT fold must finish the pending deletes without
    duplicating anything."""
    import json

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivf_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        _FOLD_MANIFEST,
        append_batch,
        fold_appends,
        load_live_index,
    )

    idx = str(tmp_path / "index")
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    batch = corpus.filter(F.col("vec_id") % 2 == 1)
    save_ivf_index(base, idx, k=8)
    append_batch(spark, batch, 0, idx)

    fold_appends(spark, idx)  # clean fold: appends now live in cells
    assert not glob.glob(f"{idx}/appends/batch=*")

    # recreate the crash window: the SAME rows exist in cells AND in a
    # leftover append dir, with the manifest naming it for deletion
    append_batch(spark, batch, 7, idx)
    leftover = f"{idx}/appends/batch=7"
    os.makedirs(f"{idx}/appends", exist_ok=True)
    with open(f"{idx}/appends/{_FOLD_MANIFEST}", "w") as fh:
        json.dump({"folded_dirs": [leftover]}, fh)

    # reader: exactly-once despite the double presence
    live = load_live_index(spark, idx)
    assert live.count() == corpus.count()
    assert live.groupBy("vec_id").count().filter("count > 1").count() == 0

    # next fold replays the pending deletes, then has nothing to fold
    stats = fold_appends(spark, idx)
    assert stats["folded_batches"] == 0
    assert not os.path.exists(f"{idx}/appends/{_FOLD_MANIFEST}")
    assert not os.path.exists(leftover)
    assert load_live_index(spark, idx).count() == corpus.count()


def test_cross_epoch_redelivery_latest_epoch_wins(spark, corpus, tmp_path):
    """The same vec_id arriving in TWO different epoch dirs (cross-epoch
    blob re-delivery) must survive exactly once, with the LATEST
    epoch's payload — in the live reader AND after a fold bakes the
    append tier into the standing cells (ADVICE r7: the append tier
    must be deduped against itself, not just against standing)."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivf_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        fold_appends,
        load_live_index,
    )

    idx = str(tmp_path / "index")
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    batch = corpus.filter(F.col("vec_id") % 2 == 1)
    save_ivf_index(base, idx, k=8)
    append_batch(spark, batch, 0, idx)
    # epoch 3 re-delivers the SAME ids with a changed payload
    append_batch(spark, batch.withColumn("label", F.col("label") + 1000), 3, idx)

    def check(live):
        assert live.count() == corpus.count()
        assert live.groupBy("vec_id").count().filter("count > 1").count() == 0
        # every re-delivered id serves the epoch-3 payload
        assert (
            live.join(batch.select("vec_id"), "vec_id", "semi")
            .filter(F.col("label") < 1000)
            .count()
            == 0
        )

    check(load_live_index(spark, idx))
    fold_appends(spark, idx)  # the fold must bake in the same winners
    check(load_live_index(spark, idx))


def test_fold_evicts_stale_copy_in_a_different_cell(spark, corpus, tmp_path):
    """A re-delivered id whose CHANGED embedding quantizes to a
    different cell leaves its stale standing copy in the old cell; the
    fold must include that cell in the rewrite so the stale row is
    evicted (ADVICE r7) — and a cell drained to empty by the eviction
    must lose its directory outright. Reader-visible state is identical
    before and after the fold."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        load_ivf_index,
        save_ivf_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        fold_appends,
        load_live_index,
    )

    idx = str(tmp_path / "index")
    save_ivf_index(corpus, idx, k=8)
    indexed, _ = load_ivf_index(spark, idx)
    # materialize the victim ids: the lazy plan reads cell=3's files,
    # which the fold under test deletes
    victim_ids = sorted(
        r.vec_id
        for r in indexed.filter(F.col("cell") == 3).select("vec_id").collect()
    )
    assert victim_ids
    victims = spark.createDataFrame(
        [(int(v),) for v in victim_ids], "vec_id long"
    )
    donor = indexed.filter(F.col("cell") == 0).limit(1).collect()[0]
    donor_emb = F.array(
        *[F.lit(float(x)) for x in donor.embedding]
    ).cast("array<float>")
    # every cell-3 member re-delivers with a cell-0 embedding
    moved = corpus.join(victims, "vec_id").select(
        "vec_id", donor_emb.alias("embedding"), "label"
    )
    append_batch(spark, moved, 0, idx)

    pre = load_live_index(spark, idx)
    pre_cells = {
        r.vec_id: r.cell
        for r in pre.join(victims, "vec_id", "semi").collect()
    }
    assert set(pre_cells.values()) == {0}  # appends win pre-fold

    fold_appends(spark, idx)
    post = load_live_index(spark, idx)
    # the fold changed nothing a reader sees
    assert post.count() == corpus.count()
    assert post.groupBy("vec_id").count().filter("count > 1").count() == 0
    post_cells = {
        r.vec_id: r.cell
        for r in post.join(victims, "vec_id", "semi").collect()
    }
    assert post_cells == pre_cells
    # the drained cell directory is gone
    assert not os.path.exists(f"{idx}/cells/cell=3")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_interleavings_equal_last_write_wins(spark, tmp_path, seed):
    """The LSM contract under RANDOM interleavings: any sequence of
    epoch appends (random id subsets, payloads that change per epoch
    and so may re-quantize to different cells) with folds injected at
    random points must leave the live reader serving EXACTLY the
    last-write-wins map — one row per id, the latest epoch's payload.
    Generalizes the two hand-built re-delivery scenarios above."""
    import numpy as np

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivf_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        fold_appends,
        load_live_index,
    )

    rng = np.random.default_rng(seed)
    dim, ids = 8, list(range(40))

    def payload(i, epoch):
        # deterministic, epoch-dependent, spread across cells
        return [float((i * 7 + epoch * 13 + j * 3) % 17) for j in range(dim)]

    def frame(rows):
        return spark.createDataFrame(
            [(int(i), payload(i, e), int(e)) for i, e in rows],
            "vec_id long, embedding array<float>, label int",
        )

    idx = str(tmp_path / "index")
    save_ivf_index(frame([(i, -1) for i in ids]), idx, k=4)
    expected = {i: -1 for i in ids}

    for epoch in range(5):
        subset = [i for i in ids if rng.random() < 0.4]
        if not subset:
            continue
        append_batch(spark, frame([(i, epoch) for i in subset]), epoch, idx)
        for i in subset:
            expected[i] = epoch
        if rng.random() < 0.5:
            fold_appends(spark, idx)
        got = {
            r.vec_id: (r.label, list(r.embedding))
            for r in load_live_index(spark, idx).collect()
        }
        want = {i: (e, payload(i, e)) for i, e in expected.items()}
        assert got == want, f"epoch {epoch} diverged"

    fold_appends(spark, idx)  # final fold: standing tier == truth
    got = {
        r.vec_id: (r.label, list(r.embedding))
        for r in load_live_index(spark, idx).collect()
    }
    assert got == {i: (e, payload(i, e)) for i, e in expected.items()}


def test_delete_from_live_index_covers_the_append_tier(
    spark, corpus, tmp_path
):
    """An erased id sitting in an UNFOLDED append batch must not
    survive erasure: delete_from_live_index folds first, then runs the
    sliver delete, so the live index afterwards contains exactly the
    non-erased corpus."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivf_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        delete_from_live_index,
        load_live_index,
    )

    idx = str(tmp_path / "index")
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    batch = corpus.filter(F.col("vec_id") % 2 == 1)
    save_ivf_index(base, idx, k=8)
    append_batch(spark, batch, 0, idx)

    # erase ids from BOTH tiers: some standing, some append-only
    dels = corpus.filter(F.col("vec_id") % 5 == 0).select("vec_id")
    report = delete_from_live_index(spark, idx, dels)
    assert report.count() > 0

    live = load_live_index(spark, idx)
    want = corpus.join(dels, "vec_id", "anti")
    assert live.count() == want.count()
    assert _ids(live) == _ids(want)


def test_null_embedding_is_quarantined_not_folded(spark, corpus, tmp_path):
    """A NULL embedding in a streamed batch maps to a NULL cell
    (assign_cells contract) and must be QUARANTINED by append_batch:
    were it written to the append tier, every subsequent fold's
    affected-cell derivation would crash comparing None with int and
    maintenance would wedge permanently on one bad record. The
    quarantined row is visible under quarantine/, absent from reads,
    and the fold still runs."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivf_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        fold_appends,
        load_live_index,
    )

    idx = str(tmp_path / "index")
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    save_ivf_index(base, idx, k=8)

    good = corpus.filter(F.col("vec_id") % 2 == 1)
    bad = spark.createDataFrame(
        [(10_000_001, None, 0)], "vec_id long, embedding array<float>, label int"
    )
    append_batch(spark, good.unionByName(bad), 0, idx)

    quarantined = spark.read.parquet(f"{idx}/quarantine/batch=0")
    assert _ids(quarantined) == {10_000_001}
    # replay of the same epoch overwrites the quarantine dir too
    append_batch(spark, good.unionByName(bad), 0, idx)
    assert spark.read.parquet(f"{idx}/quarantine/batch=0").count() == 1

    live = load_live_index(spark, idx)
    assert 10_000_001 not in _ids(live)
    report = fold_appends(spark, idx)
    assert report["folded_batches"] == 1
    after = load_live_index(spark, idx)
    assert _ids(after) == _ids(corpus)
    assert after.filter(F.col("cell").isNull()).count() == 0


def test_null_embedding_quarantined_on_batch_append_and_delete(
    spark, corpus, tmp_path
):
    """Batch path twin (ADVICE r8): append_to_ivf_index must not write a
    NULL-cell row into the cells tier (partitionBy would park it in
    __HIVE_DEFAULT_PARTITION__ — counted but never probed), and
    delete_from_ivf_index must keep working afterwards."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        append_to_ivf_index,
        delete_from_ivf_index,
        load_ivf_index,
        save_ivf_index,
    )

    idx = str(tmp_path / "index")
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    save_ivf_index(base, idx, k=8)

    good = corpus.filter(F.col("vec_id") % 2 == 1)
    bad = spark.createDataFrame(
        [(10_000_002, None, 1)], "vec_id long, embedding array<float>, label int"
    )
    append_to_ivf_index(good.unionByName(bad), idx)

    indexed, _ = load_ivf_index(spark, idx)
    assert indexed.filter(F.col("cell").isNull()).count() == 0
    assert 10_000_002 not in _ids(indexed)
    assert _ids(spark.read.parquet(f"{idx}/quarantine")) == {10_000_002}

    dels = corpus.filter(F.col("vec_id") % 5 == 0).select("vec_id")
    report = delete_from_ivf_index(spark, idx, dels)
    assert report.count() > 0
    survivors, _ = load_ivf_index(spark, idx)
    assert _ids(survivors) == _ids(corpus.join(dels, "vec_id", "anti"))


def test_batch_append_quarantine_idempotent_with_batch_key(
    spark, corpus, tmp_path
):
    """append_to_ivf_index with a batch_id writes its quarantine to an
    idempotent per-batch dir (advice r9): a retried batch REPLACES its
    quarantine rows instead of appending duplicates that would inflate
    the operator's repair work-list."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        append_to_ivf_index,
        save_ivf_index,
    )

    idx = str(tmp_path / "index")
    save_ivf_index(corpus.filter(F.col("vec_id") % 2 == 0), idx, k=8)
    bad = spark.createDataFrame(
        [(10_000_003, None, 1)], "vec_id long, embedding array<float>, label int"
    )
    append_to_ivf_index(bad, idx, batch_id=7)
    append_to_ivf_index(bad, idx, batch_id=7)  # retried batch
    q = spark.read.parquet(f"{idx}/quarantine/batch=7")
    assert q.count() == 1 and _ids(q) == {10_000_003}


def test_null_cell_contract_mismatch_raises(spark, corpus, tmp_path):
    """_write_quarantining_nulls re-derives the quarantine set from the
    NULL-embedding filter, relying on 'cell NULL iff embedding NULL'.
    The contract is asserted (advice r9): a NULL cell whose embedding
    is NOT null must raise loudly, because those rows would otherwise
    vanish from both the index and the quarantine."""
    import pytest

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        _write_quarantining_nulls,
    )

    # fabricate a broken assignment: NULL cell, non-NULL embedding
    assigned = spark.createDataFrame(
        [(1, [0.1, 0.2], None), (2, [0.3, 0.4], 3)],
        "vec_id long, embedding array<float>, cell int",
    )
    raw = assigned.drop("cell")
    sink = str(tmp_path / "valid")
    with pytest.raises(ValueError, match="contract"):
        _write_quarantining_nulls(
            assigned,
            raw,
            "embedding",
            lambda valid: valid.write.mode("overwrite").parquet(sink),
            str(tmp_path / "quarantine"),
            "overwrite",
        )


def test_intra_epoch_duplicate_id_resolves_deterministically(
    spark, corpus, tmp_path
):
    """append_batch is a public API with no per-epoch uniqueness guard:
    a duplicated vec_id WITHIN one epoch must still resolve to the same
    winner on every read and in the fold (secondary payload-hash sort
    key — a pure function of the stored data, not of partitioning)."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivf_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        append_batch,
        fold_appends,
        load_live_index,
    )

    idx = str(tmp_path / "index")
    save_ivf_index(corpus.filter(F.col("vec_id") % 2 == 0), idx, k=8)

    dup_id = 10_000_003
    dups = spark.createDataFrame(
        [
            (dup_id, [float(i) for i in range(64)], 0),
            (dup_id, [float(i + 1) for i in range(64)], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    ).repartition(4)
    append_batch(spark, dups, 0, idx)

    # the reader's winner is stable across repeated reads...
    labels = {
        load_live_index(spark, idx)
        .filter(F.col("vec_id") == dup_id)
        .collect()[0]
        .label
        for _ in range(3)
    }
    assert len(labels) == 1
    # ...and the fold bakes in the SAME winner the reader served
    fold_appends(spark, idx)
    folded = (
        load_live_index(spark, idx)
        .filter(F.col("vec_id") == dup_id)
        .collect()
    )
    assert len(folded) == 1 and folded[0].label == labels.pop()


@pytest.mark.slow
def test_stream_split_maintenance_grows_codebook_and_stays_exact(
    spark, corpus, tmp_path
):
    """E2E with split_occupancy chained onto the fold cadence: the
    stream starts on a deliberately tiny codebook (k=2 over 70% of the
    corpus — every cell far over target), folds + splits after every
    batch, and REFRESHES its cached codebook so later batches quantize
    against the grown one. End state: occupancy at target, a gap-free
    grown codebook, and a full probe still equal to brute force over
    everything ever streamed."""
    import glob as _g

    import numpy as np

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        probe_ivf,
        save_ivf_index,
    )
    from azure_serverless_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        load_live_index,
        start_vector_ingest_stream,
    )

    idx = str(tmp_path / "index")
    landing = str(tmp_path / "landing")
    base = corpus.filter(F.col("vec_id") % 10 < 7)
    arriving = corpus.filter(F.col("vec_id") % 10 >= 7)
    save_ivf_index(base, idx, k=2)
    target = int(corpus.count() / 6)

    for part in range(3):
        arriving.filter(F.col("vec_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    q = start_vector_ingest_stream(
        spark,
        landing,
        idx,
        str(tmp_path / "ckpt"),
        fold_every=1,
        split_occupancy=target,
    )
    q.awaitTermination(300)

    assert not _g.glob(f"{idx}/appends/batch=*")  # drained every fold
    live = load_live_index(spark, idx)
    assert live.count() == corpus.count()
    occ = live.groupBy("cell").agg(F.count("*").alias("n"))
    assert occ.filter(F.col("n") > target).count() == 0
    rows = spark.read.parquet(f"{idx}/centroids").orderBy("cell").collect()
    centroids = np.vstack([np.asarray(r.centroid) for r in rows])
    k_after = centroids.shape[0]
    assert k_after > 2  # the codebook actually grew
    cells = sorted(r.cell for r in occ.select("cell").collect())
    assert cells == list(range(k_after))  # gap-free
    queries = corpus.filter(F.col("vec_id") < 10)
    got = (
        probe_ivf(live, queries, centroids, k=5, nprobe=k_after)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    want = (
        cosine_topk(corpus, queries, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert got.equals(want[got.columns])


def test_stream_split_without_fold_cadence_refused(spark, tmp_path):
    import pytest

    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        start_vector_ingest_stream,
    )

    with pytest.raises(ValueError, match="split_occupancy requires"):
        start_vector_ingest_stream(
            spark,
            str(tmp_path / "landing"),
            str(tmp_path / "index"),
            str(tmp_path / "ckpt"),
            split_occupancy=10,
        )

def _shifted_frame(spark, n, id_base, offset=0):
    """Off-codebook arrivals (unit mass on one dim): quantization error
    well above anything the build corpus's subcodebooks fit."""
    import numpy as np
    import pandas as pd

    basis = np.eye(64)[(np.arange(n) + offset) % 64]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [id_base + i for i in range(n)],
                "embedding": [v.astype("float32").tolist() for v in basis],
                "label": [0] * n,
            }
        )
    ).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )


@pytest.mark.slow
def test_stream_drift_check_alerts_on_cadence(spark, corpus, tmp_path):
    """Verdict r11 item 2: the drift check runs on the stream cadence.
    An in-distribution stream must NEVER trip (no alert file, last_check
    verdict false); a planted mid-stream shift must raise the alert at
    its cadence boundary — surfaced as ``drift/alert.json``, the state
    file a deployment acts on."""
    import json as _json

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        save_ivfpq_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        start_vector_ingest_stream,
    )

    idx = str(tmp_path / "index")
    landing = str(tmp_path / "landing")
    base = corpus.filter(F.col("vec_id") % 10 < 7)
    arriving = corpus.filter(F.col("vec_id") % 10 >= 7)
    save_ivfpq_index(base, idx, k=4, m=8, pq_k=16)

    # phase 1: in-distribution arrivals only — never trips
    for part in range(2):
        arriving.filter(F.col("vec_id") % 2 == part).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    q = start_vector_ingest_stream(
        spark, landing, idx, str(tmp_path / "ckpt"),
        ivfpq=True, refit_check_every=1, drift_threshold=1.5,
    )
    q.awaitTermination(300)
    assert not os.path.exists(f"{idx}/drift/alert.json")
    with open(f"{idx}/drift/last_check.json") as fh:
        check = _json.load(fh)
    assert check["needs_refit"] is False and check["ratio"] < 1.5

    # phase 2: a shifted arrival lands; the resumed stream's next
    # cadence boundary must commit the alert
    _shifted_frame(spark, 120, 7_000_000).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    q = start_vector_ingest_stream(
        spark, landing, idx, str(tmp_path / "ckpt"),
        ivfpq=True, refit_check_every=1, drift_threshold=1.5,
    )
    q.awaitTermination(300)
    assert os.path.exists(f"{idx}/drift/alert.json")
    with open(f"{idx}/drift/alert.json") as fh:
        alert = _json.load(fh)
    assert alert["needs_refit"] is True and alert["ratio"] > 1.5


@pytest.mark.slow
def test_stream_auto_refit_repairs_and_stays_exact(spark, corpus, tmp_path):
    """auto_refit=True composes the cadence check with the codes-only
    refit: a tripped epoch repairs in-line (new subcodebooks, codes tier
    rewritten, drift bookkeeping reset, cached books refreshed so LATER
    epochs encode against the new generation), no alert is left
    standing, and the full probe over everything ingested equals brute
    force."""
    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        load_pq_codebooks,
        save_ivfpq_index,
        search_ivfpq,
    )
    from azure_serverless_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        start_vector_ingest_stream,
    )

    idx = str(tmp_path / "index")
    landing = str(tmp_path / "landing")
    base = corpus.filter(F.col("vec_id") % 10 < 7)
    held = corpus.filter(F.col("vec_id") % 10 >= 7)
    save_ivfpq_index(base, idx, k=4, m=8, pq_k=16)
    old_books = load_pq_codebooks(spark, idx)

    shifted = _shifted_frame(spark, 120, 7_000_000)
    held.coalesce(1).write.mode("append").parquet(landing)
    shifted.coalesce(1).write.mode("append").parquet(landing)
    q = start_vector_ingest_stream(
        spark, landing, idx, str(tmp_path / "ckpt"),
        ivfpq=True, refit_check_every=1, drift_threshold=1.5,
        auto_refit=True,
    )
    q.awaitTermination(300)

    assert not os.path.exists(f"{idx}/drift/alert.json")
    assert not os.path.exists(f"{idx}/_refit_commit.json")
    assert not os.path.exists(f"{idx}/codes_refit")
    new_books = load_pq_codebooks(spark, idx)
    assert new_books.shape == old_books.shape
    assert not (new_books == old_books).all()

    live = corpus.select("vec_id", "embedding").unionByName(
        shifted.select("vec_id", "embedding")
    )
    cells = spark.read.parquet(f"{idx}/cells")
    codes = spark.read.parquet(f"{idx}/codes")
    assert cells.count() == codes.count() == live.count()
    queries = corpus.filter(F.col("vec_id") < 10)
    got = (
        search_ivfpq(
            spark, idx, queries, k=5, nprobe=4, shortlist=live.count()
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    want = (
        cosine_topk(live, queries, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert got.equals(want[got.columns])


def test_stream_refit_check_requires_ivfpq(spark, corpus, tmp_path):
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        start_vector_ingest_stream,
    )

    with pytest.raises(ValueError, match="refit_check_every requires ivfpq"):
        start_vector_ingest_stream(
            spark, str(tmp_path / "l"), str(tmp_path / "i"),
            str(tmp_path / "c"), refit_check_every=1,
        )
    with pytest.raises(ValueError, match="auto_refit requires"):
        start_vector_ingest_stream(
            spark, str(tmp_path / "l"), str(tmp_path / "i"),
            str(tmp_path / "c"), ivfpq=True, auto_refit=True,
        )


def test_refresh_books_if_stale_reloads_on_generation_bump(
    spark, corpus, tmp_path
):
    """ADVICE r12: the sink's cached subcodebooks must follow the
    index's pq_gen stamp — an out-of-band refit committed between
    epochs retires the cached generation, and the per-epoch stamp
    compare reloads the books (and ONLY then: a fresh stamp is a
    no-op file read)."""
    import numpy as np

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        _pq_generation,
        load_pq_codebooks,
        refit_pq_codebooks,
        save_ivfpq_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        _refresh_books_if_stale,
    )

    idx = str(tmp_path / "index")
    save_ivfpq_index(
        corpus.select("vec_id", "embedding"), idx, k=4, m=8, pq_k=16
    )
    cache = {
        "books": load_pq_codebooks(spark, idx),
        "gen": _pq_generation(spark, idx),
    }
    assert _refresh_books_if_stale(spark, idx, cache) is False

    old_books = cache["books"].copy()
    refit_pq_codebooks(spark, idx)  # the operator's out-of-band refit

    assert _refresh_books_if_stale(spark, idx, cache) is True
    assert cache["gen"] == 1
    assert np.array_equal(cache["books"], load_pq_codebooks(spark, idx))
    assert not np.array_equal(cache["books"], old_books)
    assert _refresh_books_if_stale(spark, idx, cache) is False


@pytest.mark.slow
def test_stream_picks_up_out_of_band_refit_between_runs(
    spark, corpus, tmp_path
):
    """E2e for the ADVICE r12 scenario at the run boundary: epoch 1
    ingests, an operator refits out-of-band (alert workflow), epoch 2
    resumes the SAME checkpoint — its codes must be encoded against the
    NEW generation (asserted via the drift record: an epoch encoded
    with the retired books against the new baseline would read a
    different qerr than a direct re-encode with the live books)."""
    import numpy as np

    from azure_serverless_etl_pipeline_spark.operators.ann_index import (
        _pq_generation,
        encode_pq,
        load_pq_codebooks,
        refit_pq_codebooks,
        save_ivfpq_index,
    )
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        start_vector_ingest_stream,
    )

    base = corpus.filter(F.col("vec_id") % 3 == 0)
    b1 = corpus.filter(F.col("vec_id") % 3 == 1).localCheckpoint(eager=True)
    b2 = corpus.filter(F.col("vec_id") % 3 == 2).localCheckpoint(eager=True)

    idx = str(tmp_path / "index")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    save_ivfpq_index(base, idx, k=4, m=8, pq_k=16)

    b1.coalesce(1).write.mode("append").parquet(landing)
    start_vector_ingest_stream(
        spark, landing, idx, ckpt, ivfpq=True
    ).awaitTermination()
    assert (
        spark.read.parquet(f"{idx}/codes").count()
        == base.count() + b1.count()
    )

    refit_pq_codebooks(spark, idx)
    assert _pq_generation(spark, idx) == 1
    new_books = load_pq_codebooks(spark, idx)

    b2.coalesce(1).write.mode("append").parquet(landing)
    start_vector_ingest_stream(
        spark, landing, idx, ckpt, ivfpq=True
    ).awaitTermination()

    # every live code row must decode identically to a fresh encode of
    # its vector with the LIVE books — including epoch 2's rows, which
    # a stale cache would have encoded with the retired generation
    cells = spark.read.parquet(f"{idx}/cells").withColumn(
        "cell", F.col("cell").cast("int")
    )
    want = encode_pq(
        cells, new_books, keep_cols=("cell",)
    ).orderBy("vec_id").collect()
    got = (
        spark.read.parquet(f"{idx}/codes")
        .withColumn("cell", F.col("cell").cast("int"))
        .orderBy("vec_id")
        .collect()
    )
    assert len(got) == corpus.count()
    for g, w in zip(got, want):
        assert g.vec_id == w.vec_id
        assert list(g.codes) == list(w.codes)


def test_refit_check_every_zero_refused(spark, tmp_path):
    """ADVICE r12: refit_check_every=0 used to validate (only None was
    rejected) while the sink's falsy cadence guard silently never ran a
    check — auto_refit=True with cadence 0 was a validated no-op."""
    from azure_serverless_etl_pipeline_spark.streaming.vector_stream import (
        start_vector_ingest_stream,
    )

    with pytest.raises(ValueError, match="refit_check_every must be >= 1"):
        start_vector_ingest_stream(
            spark,
            str(tmp_path / "landing"),
            str(tmp_path / "index"),
            str(tmp_path / "ckpt"),
            ivfpq=True,
            refit_check_every=0,
            auto_refit=True,
        )
