"""Sinks: partitioned columnar writes + upsert emulation.

The reference's write surface is per-row document inserts/upserts into
Cosmos (S-6/S-7 — ``blobToCosmos.py:77``, ``blob_to_cosmosdb.py:32-38``),
RU-throttled to ~40-80 writes/s. The Spark-native equivalents are bulk
partitioned parquet writes and a MERGE-style upsert.

Scale notes:
- ``write_partitioned`` partitions by the reference's partition key
  (HomeID analog): equality predicates prune partitions at read, the
  same role Cosmos's ``/HomeID`` partition key plays.
- Without Delta in this image, ``upsert_parquet`` emulates MERGE with
  anti-join + union + full rewrite; on a Delta/Iceberg deployment this
  function body is one ``MERGE INTO`` (noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("HomeID",),
    mode: str = "append",
) -> None:
    """Bulk partitioned write — replaces the per-row create_item loop."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key: str = "id",
) -> None:
    """Idempotent upsert by key (reference T-3: ``upsert_item`` makes
    re-delivered blob triggers safe).

    Emulation of ``MERGE INTO target USING updates ON t.key = s.key WHEN
    MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT *`` for plain
    parquet: keep target rows whose key is absent from updates
    (left_anti), union the updates, rewrite. On Delta/Iceberg, replace
    the body with the real MERGE (transactional, no full rewrite).
    """
    from pyspark.errors import AnalysisException

    try:
        target = spark.read.parquet(path)
    except AnalysisException as e:
        # ONLY a missing path means "first write". Any other read failure
        # (corrupt footer, permissions, transient IO) must propagate —
        # falling through to mode("overwrite") would silently replace the
        # whole existing dataset with just the updates.
        cond = e.getCondition() if hasattr(e, "getCondition") else None
        if cond != "PATH_NOT_FOUND" and "Path does not exist" not in str(e):
            raise
        merged = updates
    else:
        keep = target.join(updates.select(key).distinct(), key, "left_anti")
        merged = keep.unionByName(updates)
    # materialize before overwrite (lazy plans must not read the path
    # they're overwriting)
    staged = merged.localCheckpoint(eager=True)
    staged.write.mode("overwrite").parquet(path)


def write_json_records(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON records sink (S-5, ``process_etl.py:14-17``)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Small-file compaction for streaming sink outputs.

    Per-micro-batch appends accumulate many small files (each batch of
    each partition writes at least one), which at scale degrades scan
    planning and NameNode/listing pressure. Rewrites the dataset into
    ceil(total_bytes / target) files. Returns the new file count.
    On Delta this is OPTIMIZE; for plain parquet it is a staged rewrite.
    """
    import os

    df = spark.read.parquet(path)
    local = path.removeprefix("file:")
    if os.path.isdir(local):
        total = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(local)
            for f in fs
            if f.endswith(".parquet")
        )
    else:  # remote FS: estimate from rows (cloud deployments use the FS API)
        total = df.count() * 64
    n_files = max(1, -(-total // target_file_bytes))
    staged = df.localCheckpoint(eager=True)
    writer = staged.coalesce(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return n_files


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write: pre-shuffle the data ONCE at write time so
    every later join/aggregation on ``bucket_by`` is exchange-free.

    This is the 100 TB answer to "the same join key shuffles every
    query": fact tables bucketed by their join key co-locate with each
    other (bucket counts equal or multiples), and Spark elides both
    Exchanges in the join plan. Requires saveAsTable (bucket metadata
    lives in the catalog, not the files).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str] | tuple[str, ...],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet write: repartitionByRange on the cluster
    keys, then sort within each partition, so every output file covers a
    narrow, non-overlapping key range.

    This is what makes parquet min/max row-group statistics *selective*:
    a range or equality predicate on the leading cluster key skips whole
    files/row-groups instead of scanning them (Delta/Iceberg call the
    same idea ZORDER/sort-clustering; single- or few-column clustering
    needs no bit-interleaving). At 100 TB the difference is a scan of
    ~1/files of the data for a point query vs all of it — before any
    executor even runs, from footer stats alone.
    """
    cols = list(cluster_by)
    part = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
