"""Z-order layout, priority dedup, delete propagation — semantics
against pure-Python references plus the plan shapes that make them
scale (map-side Morton key, narrow dedup shuffle, broadcast deletes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_serverless_etl_pipeline_spark.operators import dedup
from azure_serverless_etl_pipeline_spark.operators.layout import (
    layout_pruning_stats,
    morton_key,
    spread_bits16,
    zorder_frame,
)


def _py_spread(x: int) -> int:
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _py_morton(x: int, y: int) -> int:
    return _py_spread(x) | (_py_spread(y) << 1)


def test_morton_key_matches_bit_interleave_reference(spark):
    vals = [0, 1, 2, 3, 255, 256, 4095, 65535, 12345, 54321]
    df = spark.createDataFrame(
        [(x, y) for x in vals for y in vals], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x in vals:
        for y in vals:
            assert got[(x, y)] == _py_morton(x, y), (x, y)
    # interleave property: z-order of (x, y) sorts like the bit-merge
    assert got[(0, 0)] == 0
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_spread_bits_is_monotonic_and_sparse(spark):
    df = spark.createDataFrame([(i,) for i in range(1024)], "v long")
    rows = df.select(spread_bits16(F.col("v")).alias("s")).collect()
    seq = [r.s for r in rows]
    assert seq == sorted(seq)  # spreading preserves order
    for s in seq:  # odd bit positions stay clear for the y-lane
        assert s & 0xAAAAAAAA == 0


def test_zorder_prunes_both_dims_linear_only_leading(spark):
    # a dense 2-d grid: the worst case for linear layout on dim y
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    stats = {
        r.layout: r
        for r in layout_pruning_stats(
            grid, F.col("x"), F.col("y"), log2_buckets=4
        ).collect()
    }
    lin, zed = stats["linear"], stats["zorder"]
    assert lin.n_buckets == 16 and zed.n_buckets == 16
    # linear: perfect on the leading dim, useless on the trailing one
    assert lin.touched_x <= 2
    assert lin.touched_y == 16
    # zorder: bounded on BOTH dims, and strictly better than linear on y
    assert zed.touched_y < lin.touched_y
    assert zed.touched_x <= 8 and zed.touched_y <= 8


def test_zorder_key_is_map_side_only(spark):
    grid = spark.range(1000).select(
        (F.col("id") % 50).alias("x"), (F.col("id") / 50).cast("long").alias("y")
    )
    plan = zorder_frame(grid, F.col("x"), F.col("y"))._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the only exchange is the 1-row bounds broadcast — the Morton key
    # itself must not force a shuffle of the data side
    assert "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_priority_dedup_keeps_highest_priority_source(spark):
    rows = [
        # same text from three sources: curated must win regardless of id
        (1, "alpha", "web"),
        (2, "alpha", "curated"),
        (3, "alpha", "books"),
        # tie inside one source: lowest id wins
        (10, "beta", "web"),
        (11, "beta", "web"),
        # unlisted source ranks after every listed one
        (20, "gamma", "mystery"),
        (21, "gamma", "books"),
        # singleton passes through
        (30, "delta", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: r
        for r in dedup.priority_dedup(
            df, ["curated", "books", "web"]
        ).collect()
    }
    assert set(out) == {2, 10, 21, 30}
    assert out[2].source == "curated"
    assert out[2].n_copies == 3 and out[2].n_sources == 3
    assert out[10].n_copies == 2 and out[10].n_sources == 1
    assert out[21].source == "books"
    assert out[30].n_copies == 1


def test_priority_dedup_shuffle_carries_hash_not_text(spark):
    df = spark.createDataFrame(
        [(i, "t" * 100, "web") for i in range(10)],
        "doc_id long, text string, source string",
    )
    plan = dedup.priority_dedup(df, ["web"])._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the text column must be projected away before any exchange
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line


def test_propagate_deletes_reelection_and_full_erase(spark):
    clusters = spark.createDataFrame(
        # cluster 100: canonical 1 (best score) deleted -> 2 takes over
        # cluster 200: untouched -> must NOT be reported
        # cluster 300: all members deleted -> NULL canonical, n_after 0
        [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (6, 300), (7, 300)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7), (4, 0.6), (5, 0.5), (6, 0.4), (7, 0.3)],
        "doc_id long, quality double",
    )
    deletes = spark.createDataFrame([(1,), (6,), (7,)], "doc_id long")
    out = {
        r.cluster_id: r
        for r in dedup.propagate_deletes(clusters, deletes, scores).collect()
    }
    assert set(out) == {100, 300}
    assert out[100].old_canonical == 1 and out[100].new_canonical == 2
    assert out[100].n_before == 3 and out[100].n_after == 2
    assert out[300].new_canonical is None and out[300].n_after == 0
    assert out[300].old_canonical == 6


def test_priority_dedup_null_text_rows_pass_through(spark):
    """md5(NULL) is NULL — without the NULL-safe key every NULL-text row
    collapses into one window partition and then vanishes at the NULL
    equi-join. Each NULL-text row must survive as its own singleton."""
    rows = [
        (1, "alpha", "web"),
        (2, "alpha", "curated"),
        (3, None, "web"),
        (4, None, "curated"),
        (5, None, "mystery"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: r
        for r in dedup.priority_dedup(df, ["curated", "web"]).collect()
    }
    # duplicate text resolves normally; EVERY NULL-text row is kept,
    # each as a singleton group (NULL != NULL, so no two are "copies")
    assert set(out) == {2, 3, 4, 5}
    for i in (3, 4, 5):
        assert out[i].n_copies == 1 and out[i].n_sources == 1


def test_propagate_deletes_scoreless_members_still_count(spark):
    """Membership comes from the cluster state alone: a member missing
    from ``scores`` must still appear in n_before/n_after and rank LAST
    in the election; a deleted scoreless member must still trigger a
    re-election row with the counts reflecting the loss."""
    clusters = spark.createDataFrame(
        # cluster 100: scoreless member 3 deleted -> counts 3 -> 2
        # cluster 200: scoreless member 5 survives -> ranks after scored 4
        [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (9, 200)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(  # 3 and 5 have no score row
        [(1, 0.9), (2, 0.8), (4, 0.6), (9, 0.7)],
        "doc_id long, quality double",
    )
    deletes = spark.createDataFrame([(3,), (9,)], "doc_id long")
    out = {
        r.cluster_id: r
        for r in dedup.propagate_deletes(clusters, deletes, scores).collect()
    }
    assert set(out) == {100, 200}
    assert out[100].n_before == 3 and out[100].n_after == 2
    assert out[100].old_canonical == 1 and out[100].new_canonical == 1
    # cluster 200: 9 (best) deleted; survivor 4 (scored) beats scoreless 5
    assert out[200].n_before == 3 and out[200].n_after == 2
    assert out[200].old_canonical == 9 and out[200].new_canonical == 4


def test_quantize16_overflow_guard_raises(spark):
    """A dimension range >= 2^47 would overflow the 65535 multiply and
    emit garbage Morton keys silently; the guard must raise instead."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    wide = spark.createDataFrame(
        [(0, 0), (1 << 50, 1)], "x long, y long"
    )
    with pytest.raises(SparkRuntimeException, match="quantize16"):
        zorder_frame(wide, F.col("x"), F.col("y")).collect()


def test_propagate_deletes_broadcasts_the_erase_list(spark):
    clusters = spark.createDataFrame(
        [(i, i % 10) for i in range(100)], "doc_id long, cluster_id long"
    )
    scores = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, quality double"
    )
    deletes = spark.createDataFrame([(5,)], "doc_id long")
    plan = dedup.propagate_deletes(
        clusters, deletes, scores
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _py_hilbert(order: int, x: int, y: int) -> int:
    d, s = 0, 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_fold_matches_python_reference(spark):
    from azure_serverless_etl_pipeline_spark.operators.layout import (
        _hilbert_fold,
    )

    vals = [0, 1, 2, 3, 255, 256, 4095, 65535, 12345, 54321]
    df = spark.createDataFrame(
        [(x, y) for x in vals for y in vals], "xq long, yq long"
    )
    got = {
        (r.xq, r.yq): r.hkey for r in _hilbert_fold(df).collect()
    }
    for x in vals:
        for y in vals:
            assert got[(x, y)] == _py_hilbert(16, x, y), (x, y)
    # full-order corners
    assert got[(0, 0)] == 0
    assert max(got.values()) < 1 << 32


def test_hilbert_is_continuous_morton_is_not(spark):
    """The property that makes Hilbert the better clustering curve:
    consecutive Hilbert indexes are always GRID NEIGHBORS (|dx|+|dy| ==
    1), while the Z-curve jumps across diagonal seams. Checked on a
    full 32x32 grid (order-5 reference walk)."""
    inv = {}
    for x in range(32):
        for y in range(32):
            inv[_py_hilbert(5, x, y)] = (x, y)
    assert len(inv) == 1024  # bijective on the grid
    for d in range(1023):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, inv[d], inv[d + 1])
    # morton, by contrast, has non-neighbor steps (the seam jumps)
    jumps = 0
    minv = {}
    for x in range(32):
        for y in range(32):
            minv[_py_morton(x, y)] = (x, y)
    for d in range(1023):
        (x1, y1), (x2, y2) = minv[d], minv[d + 1]
        if abs(x1 - x2) + abs(y1 - y2) != 1:
            jumps += 1
    assert jumps > 0


def test_curve_pruning_stats_hilbert_bounds_both_dims(spark):
    from azure_serverless_etl_pipeline_spark.operators.layout import (
        curve_pruning_stats,
    )

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    stats = {
        r.layout: r
        for r in curve_pruning_stats(
            grid, F.col("x"), F.col("y"), log2_buckets=4
        ).collect()
    }
    assert set(stats) == {"hilbert", "linear", "zorder"}
    lin, zed, hil = stats["linear"], stats["zorder"], stats["hilbert"]
    assert lin.touched_y == 16  # linear useless on the trailing dim
    for r in (zed, hil):
        assert r.touched_x <= 8 and r.touched_y <= 8
    # hilbert never worse than zorder on the worst dim here
    assert max(hil.touched_x, hil.touched_y) <= max(
        zed.touched_x, zed.touched_y
    )


def test_hilbert_fold_is_map_side_only(spark):
    from azure_serverless_etl_pipeline_spark.operators.layout import (
        _hilbert_fold,
    )

    grid = spark.range(1000).select(
        (F.col("id") % 50).alias("xq"), (F.col("id") / 50).cast("long").alias("yq")
    )
    plan = _hilbert_fold(grid)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan  # 16 projection stages, zero shuffles
