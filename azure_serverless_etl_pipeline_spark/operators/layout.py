"""Multi-dimensional data layout: Z-order (Morton) clustering + a
quantified pruning comparison against linear sort order.

At 100 TB the dominant cost of almost every query is the scan, and the
one lever that cuts scan bytes without touching the query text is FILE
LAYOUT: cluster rows so each output file covers a narrow range of every
predicate column, and parquet footer min/max stats (or Delta/Iceberg
file stats) prune most files for a range predicate on ANY clustered
dimension. A linear sort (``sources.writers.write_clustered``) gives
perfect pruning on the leading column and none on the trailing ones;
interleaving the bits of the quantized dimensions — the Morton /
Z-order curve, the same idea behind Delta ``OPTIMIZE ZORDER BY`` —
spreads locality across all of them (each dimension degrades to
~sqrt(n_files) touched instead of all of them).

Everything here is integer shift/mask arithmetic on longs, so the key
and the layout-stats report are bit-exact reproducible in any engine
(the DuckDB oracle computes the identical Morton codes).

Scale shape: the Morton key is a pure map-side expression (no shuffle,
no UDF, stays inside WholeStageCodegen); the only wide stages in the
stats report are two bucket-count aggregations over (bucket, dims) —
a deployment writer would instead ``repartitionByRange(n_files,
zkey)`` + write, which is one range exchange. The deterministic
``zkey >> shift`` bucket used here models that file assignment exactly
(RangePartitioner boundaries are sample-based and nondeterministic,
which would break the cross-engine hash; the shift bucket is the same
geometry with reproducible edges).

The reference has no layout management at all — its store is a Cosmos
container with per-row upserts (`blob_to_cosmosdb.py:32-38`) and every
analytical read is a full cross-partition scan; this module is the
north-star extension that makes the 100 TB scan economics work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Morton spread masks: interleave a 16-bit value into the even bits of
# a 32-bit lane (the classic multiply-free bit-twiddling spread).
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(c: Column) -> Column:
    """Spread the low 16 bits of a long into even bit positions 0..30."""
    c = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def morton_key(xq: Column, yq: Column) -> Column:
    """Interleave two 16-bit quantized dims into one 32-bit Z-order key."""
    return spread_bits16(xq).bitwiseOR(F.shiftleft(spread_bits16(yq), 1))


def quantize16(v: Column, lo: Column, hi: Column) -> Column:
    """Map v in [lo, hi] onto the 16-bit grid 0..65535 (integer-exact).

    floor of an IEEE double division of exactly-representable longs —
    identical in Spark and DuckDB (both are correctly-rounded doubles,
    and |numerator| < 2^53 for any realistic key range).

    Input bound: (hi - lo) must stay below 2^47, or (v - lo) * 65535
    would overflow long SILENTLY (e.g. epoch-micro/nano timestamp dims)
    and yield garbage Morton keys — callers passing such dims must
    pre-scale (e.g. divide micros to seconds). Guarded at runtime with
    an explicit error instead of wrong keys.
    """
    rng = F.greatest(hi - lo, F.lit(1))
    checked = F.when(
        rng <= F.lit(1 << 47), (v - lo).cast("long")
    ).otherwise(
        F.raise_error(
            F.lit(
                "quantize16: dimension range exceeds 2^47 — the 65535 "
                "multiply would overflow long; pre-scale the dimension "
                "(e.g. timestamp micros -> seconds) before z-ordering"
            )
        ).cast("long")
    )
    return F.floor(checked * F.lit(65535) / rng).cast("long")


def with_zorder_key(
    df: DataFrame,
    dim_x: Column,
    dim_y: Column,
    key_col: str = "zkey",
    curve: str = "morton",
) -> DataFrame:
    """Attach a space-filling-curve key to every row, keeping all
    original columns (the writer-facing variant of `zorder_frame`). One
    1-row bounds aggregate broadcast back onto the scan; the key itself
    is map-side integer arithmetic. ``curve`` picks the interleave:
    ``morton`` (bit shuffle — 4 projection steps) or ``hilbert``
    (rotate-and-accumulate walk — one vectorized Arrow kernel, tighter
    per-tile spans thanks to curve continuity)."""
    if curve not in ("morton", "hilbert"):
        raise ValueError(f"curve must be morton|hilbert, got {curve!r}")
    base = df.withColumn("_zx", dim_x.cast("long")).withColumn(
        "_zy", dim_y.cast("long")
    )
    bounds = base.agg(
        F.min("_zx").alias("_zx_min"),
        F.max("_zx").alias("_zx_max"),
        F.min("_zy").alias("_zy_min"),
        F.max("_zy").alias("_zy_max"),
    )
    qx = quantize16(F.col("_zx"), F.col("_zx_min"), F.col("_zx_max"))
    qy = quantize16(F.col("_zy"), F.col("_zy_min"), F.col("_zy_max"))
    joined = base.crossJoin(F.broadcast(bounds))
    if curve == "morton":
        out = joined.withColumn(key_col, morton_key(qx, qy))
    else:
        out = _hilbert_fold(
            joined.withColumn("_zqx", qx).withColumn("_zqy", qy),
            key_col=key_col,
            x_col="_zqx",
            y_col="_zqy",
        ).drop("_zqx", "_zqy")
    return out.drop("_zx", "_zy", "_zx_min", "_zx_max", "_zy_min", "_zy_max")


def zorder_frame(
    df: DataFrame,
    dim_x: Column,
    dim_y: Column,
) -> DataFrame:
    """Attach quantized dims + the Z-order key to every row.

    Bounds are computed by a 1-row aggregate broadcast back onto the
    scan (no driver round-trip, one job): at 100 TB this is one cheap
    min/max pass — or free, when the writer already tracks column
    bounds in table metadata.
    """
    base = df.select(
        dim_x.cast("long").alias("x_raw"), dim_y.cast("long").alias("y_raw")
    )
    bounds = base.agg(
        F.min("x_raw").alias("x_min"),
        F.max("x_raw").alias("x_max"),
        F.min("y_raw").alias("y_min"),
        F.max("y_raw").alias("y_max"),
    )
    q = base.crossJoin(F.broadcast(bounds))
    q = q.select(
        "x_raw",
        "y_raw",
        quantize16(F.col("x_raw"), F.col("x_min"), F.col("x_max")).alias("xq"),
        quantize16(F.col("y_raw"), F.col("y_min"), F.col("y_max")).alias("yq"),
        "x_min",
        "x_max",
        "y_min",
        "y_max",
    )
    return q.withColumn("zkey", morton_key(F.col("xq"), F.col("yq")))


def _hilbert_key_udf(order: int):
    """Vectorized Hilbert index kernel (r14, guide §4.2): the classic
    per-bit rotate-and-accumulate walk over whole Arrow batches in
    NumPy int64 instead of ``order`` chained JVM projection stages.

    The JVM unroll kept each stage as a separate non-collapsed Project
    (inlining would grow ~3^order expression nodes), so every row paid
    ``order`` interpreted/codegen projection passes — the measured
    asymmetry between x139 (z-order, 4 shift/mask steps, 0.8 s) and
    x144 (Hilbert, 16 stages, 3.9 s). Here the walk is 16 iterations of
    a handful of NumPy int64 ufuncs over the batch. All-integer
    arithmetic (masks, shifts, xor, reflect) — no floating point, no
    rounding, so the result is bit-identical to the JVM stages and the
    DuckDB CTE twin (pytest pins both against the Python reference
    walk). Map-side expression: no shuffle, no extra scan; only the two
    long inputs cross the Arrow boundary."""
    @F.pandas_udf("long")
    def hilbert(xq: pd.Series, yq: pd.Series) -> pd.Series:
        x = xq.to_numpy(dtype=np.int64).copy()
        y = yq.to_numpy(dtype=np.int64).copy()
        d = np.zeros(len(x), dtype=np.int64)
        s = 1 << (order - 1)
        while s:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += (s * s) * ((3 * rx) ^ ry)
            # rotate/reflect the quadrant frame (same walk as the
            # Python reference in tests/test_layout_governance.py)
            refl = (ry == 0) & (rx == 1)
            xr = np.where(refl, s - 1 - x, x)
            yr = np.where(refl, s - 1 - y, y)
            swap = ry == 0
            x, y = np.where(swap, yr, xr), np.where(swap, xr, yr)
            s >>= 1
        return pd.Series(d)

    return hilbert


def _hilbert_fold(
    frame: DataFrame,
    order: int = 16,
    key_col: str = "hkey",
    x_col: str = "xq",
    y_col: str = "yq",
) -> DataFrame:
    """Fold quantized (xq, yq) into the Hilbert-curve index of the given
    order. Expects ``xq``/``yq`` columns; emits ``key_col`` — one
    vectorized Arrow kernel call per batch (``_hilbert_key_udf``),
    bit-exact to the unrolled JVM projection walk it replaced."""
    return frame.withColumn(
        key_col, _hilbert_key_udf(order)(F.col(x_col), F.col(y_col))
    )


def curve_pruning_stats(
    df: DataFrame,
    dim_x: Column,
    dim_y: Column,
    log2_buckets: int = 7,
) -> DataFrame:
    """`layout_pruning_stats` extended to THREE layouts: linear (sort on
    the leading dim), Z-order (Morton), and Hilbert. Same single-scan
    explode shape — every row fans out to its (layout, bucket) under all
    three curves, one aggregation, one 3-row reduce.

    Why Hilbert exists next to Morton: both interleave the dims, but
    the Z-curve's diagonal seams join points that are far apart in the
    plane, so some tiles span a wide range of one dimension; the
    Hilbert curve is continuous (consecutive indexes are always grid
    neighbors), which tightens per-file min/max spans and is why
    large-table clustering implementations moved from Z-order to
    Hilbert for their default layout. Both keys here are pure integer
    map-side arithmetic with bit-exact DuckDB twins."""
    z = zorder_frame(df, dim_x, dim_y)
    probes = (
        F.col("x_min") + (F.col("x_max") - F.col("x_min")) * 2 / F.lit(5),
        F.col("x_min") + (F.col("x_max") - F.col("x_min")) * 9 / F.lit(20),
        F.col("y_min") + (F.col("y_max") - F.col("y_min")) * 2 / F.lit(5),
        F.col("y_min") + (F.col("y_max") - F.col("y_min")) * 9 / F.lit(20),
    )
    z = z.select(
        "x_raw",
        "y_raw",
        "xq",
        "yq",
        "zkey",
        *(
            F.floor(p).cast("long").alias(n)
            for p, n in zip(probes, ("x_lo", "x_hi", "y_lo", "y_hi"))
        ),
    )
    h = _hilbert_fold(z)
    tagged = h.select(
        "x_raw",
        "y_raw",
        "x_lo",
        "x_hi",
        "y_lo",
        "y_hi",
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(F.col("zkey"), 32 - log2_buckets).alias(
                        "bucket"
                    ),
                ),
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.shiftright(F.col("xq"), 16 - log2_buckets).alias(
                        "bucket"
                    ),
                ),
                F.struct(
                    F.lit("hilbert").alias("layout"),
                    F.shiftright(F.col("hkey"), 32 - log2_buckets).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("lb"),
    ).select(
        "x_raw",
        "y_raw",
        "x_lo",
        "x_hi",
        "y_lo",
        "y_hi",
        F.col("lb.layout").alias("layout"),
        F.col("lb.bucket").alias("bucket"),
    )
    per_bucket = tagged.groupBy("layout", "bucket").agg(
        F.min("x_raw").alias("bx_min"),
        F.max("x_raw").alias("bx_max"),
        F.min("y_raw").alias("by_min"),
        F.max("y_raw").alias("by_max"),
        F.first("x_lo").alias("x_lo"),
        F.first("x_hi").alias("x_hi"),
        F.first("y_lo").alias("y_lo"),
        F.first("y_hi").alias("y_hi"),
    )
    hit_x = (F.col("bx_min") <= F.col("x_hi")) & (
        F.col("bx_max") >= F.col("x_lo")
    )
    hit_y = (F.col("by_min") <= F.col("y_hi")) & (
        F.col("by_max") >= F.col("y_lo")
    )
    out = per_bucket.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(hit_x.cast("long")).alias("touched_x"),
        F.sum(hit_y.cast("long")).alias("touched_y"),
    )
    return out.select(
        "layout",
        "n_buckets",
        "touched_x",
        "touched_y",
        (F.col("touched_x") / F.col("n_buckets")).alias("frac_x"),
        (F.col("touched_y") / F.col("n_buckets")).alias("frac_y"),
    ).orderBy("layout")


def layout_pruning_stats(
    df: DataFrame,
    dim_x: Column,
    dim_y: Column,
    log2_buckets: int = 7,
) -> DataFrame:
    """Compare Z-order vs linear layout by min/max-stats pruning power.

    Both layouts cut the corpus into ``2**log2_buckets`` files; for a
    ~5%-of-range probe on EACH dimension we count the files whose
    [min, max] stats overlap the probe — exactly the files a
    footer-stats reader must open. Output (2 rows, integer-exact plus
    exact int-ratio doubles):

        layout | n_buckets | touched_x | touched_y | frac_x | frac_y

    Linear wins touched_x outright (leading-column sort) but degrades
    touched_y to ~everything; Z-order holds both near sqrt. The probe
    windows are derived from the corpus bounds with integer arithmetic
    so the report is scale-factor independent.
    """
    nb = 1 << log2_buckets
    z = zorder_frame(df, dim_x, dim_y)
    # probe = [lo + 40% of range, lo + 45% of range] on each dim
    probes = (
        F.col("x_min") + (F.col("x_max") - F.col("x_min")) * 2 / F.lit(5),
        F.col("x_min") + (F.col("x_max") - F.col("x_min")) * 9 / F.lit(20),
        F.col("y_min") + (F.col("y_max") - F.col("y_min")) * 2 / F.lit(5),
        F.col("y_min") + (F.col("y_max") - F.col("y_min")) * 9 / F.lit(20),
    )
    z = z.select(
        "x_raw",
        "y_raw",
        "xq",
        "zkey",
        *(
            F.floor(p).cast("long").alias(n)
            for p, n in zip(probes, ("x_lo", "x_hi", "y_lo", "y_hi"))
        ),
    )

    # ONE execution of the zorder_frame lineage: every row fans out to
    # its (layout, bucket) assignment under BOTH layouts via a 2-element
    # explode (zkey is 32-bit, xq is 16-bit — shift down to the bucket
    # id), then one (layout, bucket) aggregation and one 2-row reduce.
    # Two separate stats() branches of a final union would re-run the
    # whole scan + bounds + quantize chain once per layout.
    tagged = z.select(
        "x_raw",
        "y_raw",
        "x_lo",
        "x_hi",
        "y_lo",
        "y_hi",
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(F.col("zkey"), 32 - log2_buckets).alias(
                        "bucket"
                    ),
                ),
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.shiftright(F.col("xq"), 16 - log2_buckets).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("lb"),
    ).select(
        "x_raw",
        "y_raw",
        "x_lo",
        "x_hi",
        "y_lo",
        "y_hi",
        F.col("lb.layout").alias("layout"),
        F.col("lb.bucket").alias("bucket"),
    )
    per_bucket = tagged.groupBy("layout", "bucket").agg(
        F.min("x_raw").alias("bx_min"),
        F.max("x_raw").alias("bx_max"),
        F.min("y_raw").alias("by_min"),
        F.max("y_raw").alias("by_max"),
        F.first("x_lo").alias("x_lo"),
        F.first("x_hi").alias("x_hi"),
        F.first("y_lo").alias("y_lo"),
        F.first("y_hi").alias("y_hi"),
    )
    hit_x = (F.col("bx_min") <= F.col("x_hi")) & (
        F.col("bx_max") >= F.col("x_lo")
    )
    hit_y = (F.col("by_min") <= F.col("y_hi")) & (
        F.col("by_max") >= F.col("y_lo")
    )
    out = per_bucket.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(hit_x.cast("long")).alias("touched_x"),
        F.sum(hit_y.cast("long")).alias("touched_y"),
    )
    return out.select(
        "layout",
        "n_buckets",
        "touched_x",
        "touched_y",
        (F.col("touched_x") / F.col("n_buckets")).alias("frac_x"),
        (F.col("touched_y") / F.col("n_buckets")).alias("frac_y"),
    ).orderBy("layout")
