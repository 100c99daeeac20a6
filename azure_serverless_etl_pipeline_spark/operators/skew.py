"""Skew-mitigation primitives for 100 TB joins/aggregations.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew; these helpers cover the cases AQE can't: a build side too
big to broadcast joined on a key with pathological hot values (the
power-law user_id / HomeID case).

``salted_join``: the hot-key salting pattern — explode the small side R
times, salt the big side with hash(row) % R, equi-join on (key, salt).
Every operator here is pure DataFrame API; at 100 TB the only knob is R.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
    salt_col: str = "__salt",
) -> DataFrame:
    """Equi-join with per-row salting of the big side.

    The big side's hot keys spread across ``salt_buckets`` partitions;
    the small side replicates each row once per bucket (explode of a
    literal range — map-side, no shuffle of its own). Output schema is
    identical to ``big.join(small, on, how)``.
    """
    on = list(on)
    big_salted = big.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    small_exploded = small.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = big_salted.join(small_exploded, [*on, salt_col], how)
    return joined.drop(salt_col)


def skewed_group_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    alias: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-phase aggregation for a hot grouping key: partial sums per
    (key, salt) then final per key. Spark's hash aggregate already does
    map-side partials; explicit salting adds a *shuffle-level* split for
    keys whose partials alone exceed one reducer (extreme power law).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum(value_col).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(alias))
