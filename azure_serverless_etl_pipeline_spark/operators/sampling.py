"""Deterministic sampling / dataset splitting (north-star extension).

A training-data pipeline needs splits that are (a) stable across runs and
engines (no RNG state), (b) computable per-row with no shuffle, and (c)
stratifiable. All three come from hashing a stable key: md5 is identical
everywhere, so bucket = int(md5(key)[:8], 16) % 100 reproduces in any
engine (the DuckDB oracle folds the same hex digits). Unlike
df.sample()/sampleBy() (seeded per-partition RNG -> resplits when
partitioning changes), the hash split never moves a row between splits
when data is repartitioned, backfilled, or appended — the property that
matters when the split feeds a 100 TB training job incrementally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable [0, buckets) assignment from the first 8 hex chars of md5."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: int = 80,
    val: int = 10,
) -> DataFrame:
    """Append a stable train/val/test label (train+val+test = 100%)."""
    b = hash_bucket(F.col(id_col))
    label = (
        F.when(b < train, "train")
        .when(b < train + val, "val")
        .otherwise("test")
    )
    return df.withColumn("bucket", b).withColumn("split", label)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket falls below the stratum's rate. Per-row predicate — no
    shuffle, no driver-side sampling state; rates ship as a broadcast
    1-row-per-stratum frame (not a Column literal) so the same plan
    works when `rates` comes from a computed DataFrame."""
    spark = df.sparkSession
    rate_df = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(rates.items())],
        f"{strata_col} string, keep_rate double",
    )
    joined = df.join(F.broadcast(rate_df), strata_col, "left").na.fill(
        {"keep_rate": default_rate}
    )
    return joined.filter(hash_bucket(F.col(id_col)) < F.col("keep_rate") * 100).drop(
        "keep_rate"
    )


def hash_uniform(key: Column) -> Column:
    """Deterministic u in (0,1) from the first 8 hex chars of md5:
    (v + 0.5) / 2^32. Every step (exact integer-valued double, one
    addition, one division) is a fixed IEEE chain, so u is bit-identical
    on any engine with md5 — the property that lets weighted sampling be
    oracle-checked exactly, unlike RNG-state samplers."""
    v = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
    )
    return (v + F.lit(0.5)) / F.lit(4294967296.0)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    strata_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (sequential
    Poisson / Ohlsson): priority = u / w with u = hash_uniform(id); the
    k SMALLEST priorities per stratum win, so inclusion probability is
    approximately proportional to weight — the standard single-pass
    pps-sampling scheme (the exact-πps variant, Efraimidis-Spirakis
    u^(1/w), needs pow/ln whose last ULP is engine-specific; u/w is one
    exact IEEE division, so this output is hash-checkable bit for bit).

    One scan + one rank window per stratum; no RNG state, stable under
    repartitioning/backfill like every sampler in this module. The
    UNSTRATIFIED case skips the window entirely — a row_number over an
    empty partitionBy would drag the whole dataset through one reducer
    on Spark versions without WindowGroupLimit pushdown — and runs as
    orderBy(priority).limit(k), which Spark plans as TakeOrdered:
    per-partition partial top-k, only k rows ever reach the driver-side
    merge, regardless of corpus size.

    Non-positive weights get priority +Inf EXPLICITLY: a zero weight
    means zero inclusion probability, and leaving it to division would
    diverge across engines (Spark's non-ANSI u/0 is NULL, which sorts
    NULLS FIRST ascending and would always WIN; IEEE u/0.0 is +Inf and
    always loses).
    """
    from pyspark.sql import Window as W

    w_d = F.col(weight_col).cast("double")
    pri = F.when(
        w_d > 0, hash_uniform(F.col(id_col)) / w_d
    ).otherwise(F.lit(float("inf")))
    if strata_col is None:
        return (
            df.withColumn("__pri", pri)
            .orderBy(F.col("__pri").asc(), F.col(id_col).asc())
            .limit(k)
            .drop("__pri")
        )
    w = W.partitionBy(strata_col).orderBy(pri.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
