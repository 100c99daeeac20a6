"""operators/compaction: row identity, file-count bound, idempotent
re-run, healthy-file skip, crash-manifest resume."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A directory written as 12 tiny per-'micro-batch' parquet files."""
    path = str(tmp_path / "table")
    for i in range(12):
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id"), (F.col("id") % 7).alias("v")
        ).coalesce(1).write.mode("append").parquet(path)
    return path


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]


def test_compact_preserves_rows_and_bounds_files(spark, fragmented):
    from azure_serverless_etl_pipeline_spark.operators.compaction import (
        compact_parquet_dir,
    )

    before = spark.read.parquet(fragmented).toPandas().sort_values("id")
    n_before = len(_parquet_files(fragmented))
    assert n_before >= 12

    stats = compact_parquet_dir(spark, fragmented, target_bytes=1 << 20)
    assert stats["compacted"] and stats["rewritten"] == n_before
    assert len(_parquet_files(fragmented)) == 1  # all tiny -> one bin

    after = spark.read.parquet(fragmented).toPandas().sort_values("id")
    assert before.reset_index(drop=True).equals(after.reset_index(drop=True))


def test_compact_rerun_is_noop(spark, fragmented):
    from azure_serverless_etl_pipeline_spark.operators.compaction import (
        compact_parquet_dir,
    )

    compact_parquet_dir(spark, fragmented, target_bytes=1 << 20)
    files = sorted(_parquet_files(fragmented))
    stats = compact_parquet_dir(spark, fragmented, target_bytes=1 << 20)
    assert not stats["compacted"] and stats["rewritten"] == 0
    assert sorted(_parquet_files(fragmented)) == files  # untouched


def test_compact_skips_healthy_files(spark, fragmented):
    from azure_serverless_etl_pipeline_spark.operators.compaction import (
        compact_parquet_dir,
    )

    # with a tiny threshold every existing file counts as healthy
    stats = compact_parquet_dir(
        spark, fragmented, target_bytes=1 << 20, min_file_bytes=10
    )
    assert not stats["compacted"]
    assert len(_parquet_files(fragmented)) >= 12


def test_compact_resumes_pending_manifest(spark, fragmented):
    """A committed manifest left by a crash (moves done, originals not
    yet deleted) is finished before anything else — no duplicate rows."""
    from azure_serverless_etl_pipeline_spark.operators.compaction import (
        _MANIFEST,
        compact_parquet_dir,
    )

    rows_want = spark.read.parquet(fragmented).count()
    # simulate the post-commit crash window: duplicate one file under a
    # compacted- name (its move already happened), manifest still
    # pointing at the original for deletion
    victim = sorted(_parquet_files(fragmented))[0]
    src = os.path.join(fragmented, victim)
    dup = os.path.join(fragmented, f"compacted-deadbeef-{victim}")
    with open(src, "rb") as fh, open(dup, "wb") as out:
        out.write(fh.read())
    mpath = os.path.join(fragmented, _MANIFEST)
    with open(mpath, "w") as fh:
        json.dump(
            {
                "self": mpath,
                "tmp": os.path.join(fragmented, ".compact-deadbeef"),
                "moves": [],
                "originals": [src],
            },
            fh,
        )

    stats = compact_parquet_dir(spark, fragmented, target_bytes=1 << 20)
    assert stats["resumed_deletes"] == 1
    assert not os.path.exists(src)
    assert not os.path.exists(mpath)
    assert spark.read.parquet(fragmented).count() == rows_want


def test_compact_sweeps_uncommitted_staging(spark, fragmented):
    """A staging dir with NO manifest (crash before the commit point)
    must be swept; the data directory is untouched — no duplicates, no
    loss."""
    from azure_serverless_etl_pipeline_spark.operators.compaction import (
        compact_parquet_dir,
    )

    rows_want = spark.read.parquet(fragmented).count()
    n_before = len(_parquet_files(fragmented))
    staging = os.path.join(fragmented, ".compact-0ddba11")
    os.makedirs(staging)
    victim = sorted(_parquet_files(fragmented))[0]
    with open(os.path.join(fragmented, victim), "rb") as fh, open(
        os.path.join(staging, "part-00000.parquet"), "wb"
    ) as out:
        out.write(fh.read())

    stats = compact_parquet_dir(
        spark, fragmented, target_bytes=1 << 20, min_file_bytes=10
    )
    assert not stats["compacted"]
    assert not os.path.exists(staging)
    assert len(_parquet_files(fragmented)) == n_before
    assert spark.read.parquet(fragmented).count() == rows_want
