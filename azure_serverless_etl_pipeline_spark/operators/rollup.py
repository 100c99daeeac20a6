"""Algebraic aggregate maintenance: fold late-arriving events into a
materialized rollup WITHOUT rescanning history.

The complement of the incremental dedup family (x117b) for the
aggregation side of the house: a daily rollup keyed by (event_type,
day) is an algebraic summary — counts and decimal sums merge by
addition, min/max by min/max — so a late batch folds in as
``rollup ⊎ aggregate(late)``: one aggregation over the BATCH plus one
outer-join merge against the standing rollup, cost proportional to the
batch and the touched groups, never to the history. This is what a
100 TB pipeline does nightly instead of recomputing month-old
partitions because 0.1% of events arrived late.

Exactness contract: the rollup carries its sums as DECIMAL(18,4)
(order-independent, associative), so ``merge(old, delta)`` is
bit-identical to the one-shot aggregate over all events — the x131
oracle checks exactly that. Doubles appear only in the final emission
(the same dsum/davg convention as every other query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYS = ["event_type", "day"]


def daily_rollup(events: DataFrame) -> DataFrame:
    """(type, day) -> n_events, decimal sum(value), min/max(value).
    The mergeable form: sums stay DECIMAL(18,4)."""
    ts = F.col("ts").cast("timestamp")
    return events.groupBy(
        "event_type", F.to_date(ts).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value_dec"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def merge_rollup(old: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a late batch's rollup into the standing one: full-outer on
    the group keys, component-wise algebraic merge. Touched groups pay
    one join row; untouched groups stream through unchanged."""
    o = old.select(
        *KEYS,
        F.col("n_events").alias("o_n"),
        F.col("sum_value_dec").alias("o_s"),
        F.col("min_value").alias("o_min"),
        F.col("max_value").alias("o_max"),
    )
    d = delta.select(
        *KEYS,
        F.col("n_events").alias("d_n"),
        F.col("sum_value_dec").alias("d_s"),
        F.col("min_value").alias("d_min"),
        F.col("max_value").alias("d_max"),
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return o.join(d, KEYS, "full_outer").select(
        *KEYS,
        (F.coalesce(F.col("o_n"), F.lit(0)) + F.coalesce(F.col("d_n"), F.lit(0)))
        .cast("long")
        .alias("n_events"),
        (F.coalesce(F.col("o_s"), zero) + F.coalesce(F.col("d_s"), zero)).alias(
            "sum_value_dec"
        ),
        F.least(
            F.coalesce(F.col("o_min"), F.col("d_min")),
            F.coalesce(F.col("d_min"), F.col("o_min")),
        ).alias("min_value"),
        F.greatest(
            F.coalesce(F.col("o_max"), F.col("d_max")),
            F.coalesce(F.col("d_max"), F.col("o_max")),
        ).alias("max_value"),
    )


def emit_rollup(rollup: DataFrame) -> DataFrame:
    """Final (driver-comparable) projection: decimal -> double, derived
    mean; day as timestamp (never DateType in query output)."""
    return rollup.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        (F.col("sum_value_dec").cast("double") / F.col("n_events")).alias(
            "avg_value"
        ),
        "min_value",
        "max_value",
    )


__all__ = ["daily_rollup", "merge_rollup", "emit_rollup"]
