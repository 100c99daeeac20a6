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


def test_stream_with_compaction_preserves_truth(spark, tmp_path):
    """E2E: drain the stream with compact_every=1 (OPTIMIZE after every
    fold) — the folded map must still equal batch truth, the compaction
    must actually rewrite the per-batch small files, and base-row
    identity must survive the rewrite."""
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        current_map,
        start_dedup_stream,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    landing = str(tmp_path / "landing")
    for part in range(3):
        docs.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    state = str(tmp_path / "state")
    q = start_dedup_stream(
        spark,
        landing,
        state,
        str(tmp_path / "ckpt"),
        compact_every=1,
    )
    q.awaitTermination(300)

    got = current_map(spark, state).toPandas()
    assert dict(zip(got["doc_id"], got["cluster_id"])) == _truth(docs)
    # compaction really ran somewhere: the shuffle-written leaves (df /
    # map, one file per reducer) get bin-packed to compacted- files;
    # single-file leaves (base, one file per arriving batch) are
    # correctly left alone
    import os

    compacted = [
        os.path.join(sub, d, f)
        for sub in ("base", "df", "map")
        for d in os.listdir(os.path.join(state, sub))
        if d.startswith("batch=")
        for f in os.listdir(os.path.join(state, sub, d))
        if f.startswith("compacted-")
    ]
    assert compacted, "no leaf was compacted"
    # base-row identity survived the rewrite
    base = spark.read.parquet(os.path.join(state, "base"))
    assert base.select("doc_id").distinct().count() == docs.count()


def test_compact_state_crash_resume(spark, tmp_path):
    """A compaction crash mid-swap (committed manifest, deletes pending)
    must replay on the next maintenance pass, and a crash-rerun of the
    last FOLD over the compacted state must still be idempotent — the
    row-identity + cluster-map contract the reference's idempotent
    upsert story (blob_to_cosmosdb.py:32-38) delegates to its store."""
    import json
    import os

    from azure_serverless_etl_pipeline_spark.operators.compaction import (
        _MANIFEST,
    )
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        compact_state,
        current_map,
        fold_batch,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    b0 = docs.filter(F.col("doc_id") % 2 == 0).repartition(4)
    b1 = docs.filter(F.col("doc_id") % 2 == 1).repartition(4)
    fold_batch(spark, b0, 0, state)
    fold_batch(spark, b1, 1, state)
    want = _truth(docs)

    # simulate the post-commit crash window in base/batch=0: one file
    # already duplicated under its compacted- name, manifest still
    # pointing at the original for deletion (same shape as
    # test_compaction.py's resume test)
    leaf = os.path.join(state, "base", "batch=0")
    victim = sorted(
        f for f in os.listdir(leaf)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )[0]
    src = os.path.join(leaf, victim)
    dup = os.path.join(leaf, f"compacted-deadbeef-{victim}")
    with open(src, "rb") as fh, open(dup, "wb") as out:
        out.write(fh.read())
    mpath = os.path.join(leaf, _MANIFEST)
    with open(mpath, "w") as fh:
        json.dump(
            {
                "self": mpath,
                "tmp": os.path.join(leaf, ".compact-deadbeef"),
                "moves": [],
                "originals": [src],
            },
            fh,
        )

    stats = compact_state(spark, state)
    # flat leaves (base/ids/map/redelivered x batch) + the two bucketed
    # roots' OBSERVED bucket leaves — counted on disk, not assumed 16
    # per batch: a shingle distribution that leaves a bucket empty (or
    # a future bucket-count change) is not a product defect (advice r9)
    import glob

    expected = 0
    for sub in ("base", "ids", "map", "redelivered"):
        expected += len(glob.glob(os.path.join(state, sub, "batch=*")))
    for sub in ("df", "postings"):
        for bdir in glob.glob(os.path.join(state, sub, "batch=*")):
            buckets = glob.glob(os.path.join(bdir, "bucket=*"))
            expected += len(buckets) if buckets else 1
    assert expected >= 3 * 2  # sanity: the flat roots are all there
    assert stats["dirs"] == expected
    assert not os.path.exists(mpath)  # pending manifest replayed
    assert not os.path.exists(src)  # original deleted exactly once

    # row identity through crash + compact
    base = spark.read.parquet(os.path.join(state, "base"))
    assert base.select("doc_id").distinct().count() == docs.count()
    assert base.count() == base.select("doc_id").distinct().count()

    # crash-rerun of the last fold over the COMPACTED state: idempotent,
    # still batch truth
    fold_batch(spark, b1, 1, state)
    got = current_map(spark, state).toPandas()
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want


def test_streamed_state_serves_governance_across_crash_resume(spark, tmp_path):
    """E2E governance on the STREAMED state (round-7): file arrivals ->
    dedup_stream(compact_every=2) -> crash (stream stops after draining
    two files) -> a third file lands -> a RESUMED stream on the same
    checkpoint folds it -> current_map -> propagate_deletes. The delete
    propagation computed from the streamed/compacted/resumed state must
    equal the one computed from one-shot batch truth — the RTBF path
    must not depend on how the state was built."""
    from azure_serverless_etl_pipeline_spark.operators import text as text_ops
    from azure_serverless_etl_pipeline_spark.operators.dedup import (
        dup_clusters,
        ngram_jaccard_pairs,
        propagate_deletes,
    )
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        current_map,
        start_dedup_stream,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # two files land; the stream drains them (availableNow) and stops —
    # the "crash" point, with a compaction pass already behind it
    for part in range(2):
        docs.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    q = start_dedup_stream(spark, landing, state, ckpt, compact_every=2)
    q.awaitTermination(300)

    # a third file lands; a NEW stream on the SAME checkpoint resumes
    # exactly where the dead one stopped (no refold of files 0-1)
    docs.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    q2 = start_dedup_stream(spark, landing, state, ckpt, compact_every=2)
    q2.awaitTermination(300)

    streamed = current_map(spark, state)
    truth_clusters = dup_clusters(
        ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_freq=50)
    )

    scores = text_ops.quality_score(docs).select("doc_id", "quality")
    deletes = docs.filter(F.col("doc_id") % 17 == 5).select("doc_id")

    def report(clusters):
        out = propagate_deletes(clusters, deletes, scores).toPandas()
        return sorted(map(tuple, out.fillna(-1).values.tolist()))

    assert report(streamed) == report(truth_clusters)
    assert report(streamed), "erase list must affect at least one cluster"


def test_random_batch_splits_fold_to_batch_truth(spark, tmp_path):
    """Randomized fold contract (the vector-stream LSM test's text
    twin): a SEEDED random partition of the corpus into uneven batches,
    folded one at a time with compaction injected at random points,
    must serve current_map == one-shot batch truth over everything
    delivered so far AFTER EVERY FOLD — not just at drain. Catches
    prefix-state bugs (stale df sums, wrong 'latest map' pick) that an
    end-only comparison can mask."""
    import numpy as np

    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        compact_state,
        current_map,
        fold_batch,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    rng = np.random.default_rng(11)
    n_batches = 4
    # uneven random assignment, engine-side (hash of doc_id + seed)
    assign = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(11)), F.lit(n_batches))
    state = str(tmp_path / "state")
    delivered = None
    for b in range(n_batches):
        batch = docs.filter(assign == b)
        fold_batch(spark, batch, b, state)
        delivered = batch if delivered is None else delivered.unionByName(batch)
        if rng.random() < 0.5:
            compact_state(spark, state)
        got = current_map(spark, state).toPandas()
        got_map = dict(zip(got["doc_id"], got["cluster_id"]))
        assert got_map == _truth(delivered), f"diverged after batch {b}"


def test_cross_batch_redelivery_first_wins_and_quarantines(spark, tmp_path):
    """An id arriving AGAIN in a later batch (the cross-batch
    re-delivery the within-batch overwrite cannot cover) must be
    diverted by the first-delivery-wins guard: the standing base holds
    exactly one copy per id, the map equals the one-shot truth over
    FIRST copies, and the diverted rows are visible under
    redelivered/batch=k — never silently dropped. Without the guard
    the duplicate copy double-counts document frequencies (cap recall
    loss vs one-shot) and, for changed text, plants stale-shingle
    edges the star-edge fold can never retract."""
    import os

    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        current_map,
        start_dedup_stream,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    landing = str(tmp_path / "landing")
    first = docs.filter(F.col("doc_id") % 3 == 0)
    second = docs.filter(F.col("doc_id") % 3 == 1)
    first.coalesce(1).write.mode("append").parquet(landing)
    second.coalesce(1).write.mode("append").parquet(landing)
    # third file re-delivers a slice of the FIRST file with changed
    # text (an upstream update) plus genuinely new docs
    changed = first.filter(F.col("doc_id") % 2 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" totally changed suffix"))
    )
    third = docs.filter(F.col("doc_id") % 3 == 2).unionByName(changed)
    third.coalesce(1).write.mode("append").parquet(landing)

    state = str(tmp_path / "state")
    q = start_dedup_stream(
        spark, landing, state, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    # invariant: one standing copy per id
    base = spark.read.parquet(f"{state}/base")
    assert base.count() == base.select("doc_id").distinct().count()
    # the map is the one-shot truth over FIRST copies (= docs verbatim)
    got = current_map(spark, state).toPandas()
    assert dict(zip(got["doc_id"], got["cluster_id"])) == _truth(docs)
    # the diverted copies are visible, with their re-delivered payload
    redeliv_root = f"{state}/redelivered"
    assert os.path.isdir(redeliv_root)
    red = spark.read.parquet(redeliv_root)
    want_ids = {r.doc_id for r in changed.select("doc_id").collect()}
    assert {r.doc_id for r in red.collect()} == want_ids
    assert red.filter(~F.col("text").endswith("changed suffix")).count() == 0


def test_fully_redelivered_batch_is_a_noop_fold(spark, tmp_path):
    """A later file consisting ENTIRELY of already-seen ids must fold
    to a no-op: map unchanged, base unchanged, every row quarantined."""
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        current_map,
        fold_batch,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    fold_batch(spark, half, 0, state)
    before = current_map(spark, state).toPandas()
    fold_batch(spark, half, 1, state)  # same rows again, new batch id
    after = current_map(spark, state).toPandas()
    assert dict(zip(after["doc_id"], after["cluster_id"])) == dict(
        zip(before["doc_id"], before["cluster_id"])
    )
    base = spark.read.parquet(f"{state}/base")
    assert base.count() == base.select("doc_id").distinct().count()
    red = spark.read.parquet(f"{state}/redelivered/batch=1")
    assert red.count() == half.count()


def test_zero_shingle_first_batches_fold_cleanly(spark, tmp_path):
    """An all-too-short first file (every doc under the shingle width)
    commits NO data file into the partitioned posting/df layers; later
    folds must still read the roots (explicit layer schemas — inference
    over footerless layers would kill the stream) and produce batch
    truth, and re-delivery of a short doc must still be diverted (the
    ids sidecar registers zero-shingle first deliveries)."""
    import pandas as pd

    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        current_map,
        fold_batch,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    short = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [9_000_001, 9_000_002], "text": ["one two", "ha"]}
        )
    )
    fold_batch(spark, short, 0, state)
    fold_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), 1, state)
    fold_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), 2, state)
    got = current_map(spark, state).toPandas()
    assert dict(zip(got["doc_id"], got["cluster_id"])) == _truth(docs)
    # the short doc's re-delivery (changed text) is diverted, not folded
    fold_batch(
        spark,
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [9_000_001], "text": ["one two three"]})
        ),
        3,
        state,
    )
    red = spark.read.parquet(f"{state}/redelivered/batch=3")
    assert {r.doc_id for r in red.collect()} == {9_000_001}
    after = current_map(spark, state).toPandas()
    assert dict(zip(after["doc_id"], after["cluster_id"])) == _truth(docs)


def test_pre_bucketed_state_is_refused_loudly(spark, tmp_path):
    """Folding into a state whose base layers predate the bucketed
    postings/df layout must fail with a clear migration message, not
    silently hide the standing corpus from candidate generation."""
    import shutil

    import pytest

    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        fold_batch,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    fold_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), 0, state)
    shutil.rmtree(f"{state}/postings")  # simulate a pre-round-9 state
    with pytest.raises(ValueError, match="bucketed layout") as exc:
        fold_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), 1, state)
    # the recovery instruction names the modulus the backfill must use
    # (the pinned value — NOT whatever the failing call passed)
    assert "n_buckets=16" in str(exc.value)
    # the refused fold left the state byte-identical: no new sidecar,
    # no new layers (advice r9 — a refusal that first pinned meta or
    # wrote artifacts would leave recovery guessing)
    import os

    assert not os.path.exists(f"{state}/ids/batch=1")
    assert not os.path.exists(f"{state}/base/batch=1")


def test_refusal_before_first_meta_pin_leaves_state_untouched(
    spark, tmp_path
):
    """The legacy refusal must fire BEFORE the first fold pins meta
    (advice r9): a pre-bucketed state with NO meta yet (the actual
    pre-round-9 shape) gets the refusal with meta still absent, so the
    backfill + the retried fold agree on one modulus by construction."""
    import os

    import pytest

    from azure_serverless_etl_pipeline_spark.operators.dedup import (
        word_shingles,
    )
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        fold_batch,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    # hand-build the pre-round-9 shape: a base layer, nothing else
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(
            F.col("doc_id"), word_shingles(F.col("text"), 3).alias("shingles")
        )
        .write.mode("overwrite")
        .parquet(f"{state}/base/batch=0")
    )
    with pytest.raises(ValueError, match="bucketed layout") as exc:
        fold_batch(
            spark, docs.filter(F.col("doc_id") % 2 == 1), 1, state,
            posting_buckets=8,
        )
    assert "n_buckets=8" in str(exc.value)
    assert not os.path.exists(f"{state}/meta")  # nothing was pinned
    assert not os.path.exists(f"{state}/ids")


def test_mismatched_layer_bucket_modulus_refused(spark, tmp_path):
    """A backfilled layer whose bucket dirs contradict the pinned
    modulus must be refused at the next fold, not silently mis-pruned
    (advice r9: the reader prunes on pmod(hash, pinned) and would skip
    out-of-range buckets forever — missed duplicate pairs, no error)."""
    import os

    import pytest

    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.dedup_stream import (
        fold_batch,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    fold_batch(spark, docs.filter(F.col("doc_id") % 3 == 0), 0, state)
    # a layer written with a LARGER modulus (e.g. the 64-bucket default
    # of materialize_incremental_state) leaves bucket dirs the pinned
    # 16-modulus reader can never probe
    os.makedirs(f"{state}/postings/batch=5/bucket=33")
    with pytest.raises(ValueError, match="bucket=33") as exc:
        fold_batch(spark, docs.filter(F.col("doc_id") % 3 == 1), 6, state)
    assert "posting_buckets=16" in str(exc.value)
