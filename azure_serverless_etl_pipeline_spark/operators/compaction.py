"""Small-file compaction for streaming-ingest output (bin-packing OPTIMIZE).

The streaming ingest (streaming/file_ingest.py, reference T-1/T-2) writes
one parquet file set per micro-batch — the standard small-files problem:
at 100 TB a day of per-minute batches yields millions of KB-scale files,
and every downstream scan pays a task + an open/footer-read per file.
This operator is the maintenance half the reference's Cosmos upsert story
delegates to its store (`blob_to_cosmosdb.py:32-38` — re-delivered rows
collapse server-side; a file-based table needs an explicit OPTIMIZE):

- only files BELOW the threshold are rewritten (bin-packed toward
  ``target_bytes``); already-compacted files are never touched, so the
  steady-state cost tracks the new-data rate, not the table size;
- re-run is a no-op once no two undersized files remain (idempotent);
- crash-safe by manifest: compacted files land under unique names
  FIRST, then a manifest drives deletion of the originals; a re-run
  that finds a manifest finishes the deletion before doing anything
  else, so no interleaving loses rows. Without a transactional table
  format (Delta/Iceberg) the swap is not snapshot-isolated — a reader
  overlapping the (short) delete window can see a row twice; run as an
  offline maintenance pass, exactly like HDFS-era compaction jobs.

Operates on one leaf directory; a partitioned table compacts per
partition directory (embarrassingly parallel across partitions — the
deployment loop the caller owns). Uses the Hadoop FileSystem API
throughout, so the same code runs against local paths in tests and
abfss/s3a in production.
"""

from __future__ import annotations

import json
import math
import uuid

from pyspark.sql import SparkSession

_MANIFEST = "_compaction_pending_delete.json"


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _list_parquet(jvm, fs, jdir) -> list[tuple[str, int]]:
    out = []
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet") and not name.startswith((".", "_")):
            out.append((st.getPath().toString(), int(st.getLen())))
    return out


def _finish_pending(jvm, fs, jdir) -> int:
    """Resume a crashed run: delete originals the manifest says were
    already rewritten, then drop the manifest."""
    mpath = jvm.org.apache.hadoop.fs.Path(jdir, _MANIFEST)
    if not fs.exists(mpath):
        return 0
    stream = fs.open(mpath)
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    deleted = 0
    for p in json.loads(raw.decode("utf-8")):
        jp = jvm.org.apache.hadoop.fs.Path(p)
        if fs.exists(jp):
            fs.delete(jp, False)
            deleted += 1
    fs.delete(mpath, False)
    return deleted


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    min_file_bytes: int | None = None,
) -> dict:
    """Bin-pack the undersized parquet files of ``path`` toward
    ``target_bytes`` per output file. Returns the action taken:
    {compacted, files_before, files_after, rewritten, bytes_rewritten}.

    ``min_file_bytes`` (default target/2) is the undersized threshold —
    files at or above it are considered healthy and skipped.
    """
    jvm, jdir, fs = _fs_for(spark, path)
    min_file_bytes = min_file_bytes or target_bytes // 2

    resumed = _finish_pending(jvm, fs, jdir)
    files = _list_parquet(jvm, fs, jdir)
    small = [(p, sz) for p, sz in files if sz < min_file_bytes]
    if len(small) <= 1:
        return {
            "compacted": False,
            "files_before": len(files),
            "files_after": len(files),
            "rewritten": 0,
            "bytes_rewritten": 0,
            "resumed_deletes": resumed,
        }

    total = sum(sz for _, sz in small)
    n_out = max(1, math.ceil(total / target_bytes))
    run_id = uuid.uuid4().hex[:8]
    tmp = f"{path.rstrip('/')}/.compact-{run_id}"
    # One distributed read of ONLY the undersized files -> n_out files.
    # coalesce (not repartition): pure bin-packing, no shuffle.
    spark.read.parquet(*[p for p, _ in small]).coalesce(n_out).write.mode(
        "overwrite"
    ).parquet(tmp)

    # land compacted files under unique names BEFORE any delete
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    moved = 0
    for st in fs.listStatus(jtmp):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            dest = jvm.org.apache.hadoop.fs.Path(
                jdir, f"compacted-{run_id}-{name}"
            )
            fs.rename(st.getPath(), dest)
            moved += 1
    # manifest -> delete originals -> drop manifest (crash at any point
    # resumes to the same end state; rows are never only-in-tmp)
    mpath = jvm.org.apache.hadoop.fs.Path(jdir, _MANIFEST)
    out = fs.create(mpath, True)
    try:
        out.write(json.dumps([p for p, _ in small]).encode("utf-8"))
    finally:
        out.close()
    for p, _ in small:
        fs.delete(jvm.org.apache.hadoop.fs.Path(p), False)
    fs.delete(mpath, False)
    fs.delete(jtmp, True)

    return {
        "compacted": True,
        "files_before": len(files),
        "files_after": len(files) - len(small) + moved,
        "rewritten": len(small),
        "bytes_rewritten": total,
        "resumed_deletes": resumed,
    }


__all__ = ["compact_parquet_dir"]
