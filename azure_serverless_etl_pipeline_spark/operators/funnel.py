"""Ordered event-funnel analysis (north-star extension).

"Of the users who did A, how many then did B, then C?" — the classic
product-analytics question. The funnel semantics used here (and by the
DuckDB oracle twin) are FIRST-QUALIFYING-TIME: step i's timestamp for a
user is the EARLIEST event of step i's type that is strictly after the
user's step i-1 timestamp. A user reaches step i iff such an event
exists; reaching step i requires reaching i-1 (monotone counts).

Plan shape: one aggregation per step, every one keyed on the user
column — the first shuffle establishes the hash partitioning and every
subsequent per-step join/aggregate reuses it (ENSURE_REQUIREMENTS
inserts no new exchange for an already-satisfied distribution), so an
n-step funnel costs one corpus scan per step type + one user-keyed
shuffle, not n. Per-step events are filtered BEFORE the shuffle
(event_type pushdown), so each step moves only its own event slice.
At 100 TB the standard refinement is pre-bucketing the event table by
user so the whole funnel is exchange-free; the operator composes with
sources.writers.write_bucketed for that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user first-qualifying timestamp for every funnel step.

    Returns (user_col, t1, t2, ..., tn) with NULL from the first
    unreached step onward.
    """
    ts = F.col(ts_col).cast("timestamp")
    out = None
    for i, step in enumerate(steps, start=1):
        ev_i = events.filter(F.col(type_col) == step).select(
            F.col(user_col), ts.alias("_ts")
        )
        if out is None:
            out = ev_i.groupBy(user_col).agg(F.min("_ts").alias(f"t{i}"))
            continue
        prev = f"t{i-1}"
        nxt = (
            ev_i.join(out.select(user_col, prev), user_col)
            .filter(F.col("_ts") > F.col(prev))
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def funnel_summary(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-step funnel counts + mean hours from the previous step.

    Returns one row per step: (step_idx, step, n_users,
    avg_hours_from_prev) — NULL avg for step 1. Mean is decimal-exact
    over per-user hour gaps rounded to 6 (order-independent, safe to
    hash-check).
    """
    times = funnel_times(events, steps, user_col, type_col, ts_col)
    rows = []
    for i, step in enumerate(steps, start=1):
        t, p = f"t{i}", f"t{i-1}"
        gap_h = F.round(
            (F.unix_micros(F.col(t)) - F.unix_micros(F.col(p))) / 3.6e9, 6
        )
        agg = times.agg(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.col(t)).alias("n_users"),
            (
                F.sum(gap_h.cast("decimal(38,6)")).cast("double")
                / F.count(F.when(F.col(t).isNotNull(), F.lit(1)))
            ).alias("avg_hours_from_prev")
            if i > 1
            else F.lit(None).cast("double").alias("avg_hours_from_prev"),
        )
        rows.append(agg)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
