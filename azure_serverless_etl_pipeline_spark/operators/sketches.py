"""Mergeable-sketch operators (Apache DataSketches via Spark 4 built-ins).

The 100 TB pattern these enable is PRE-AGGREGATE ONCE, RE-AGGREGATE
FOREVER: a sketch built per fine bucket (day, partition, shard) merges
into any coarser rollup without rescanning raw data — the continuous-
aggregate / hypertable-rollup design. Exact twins exist in this engine
(g03/g04 countDistinct, x49 percentile, x48 set overlap); these are the
bounded-memory counterparts whose state is kilobytes per group no matter
how many rows feed them.

- ``daily_sketch_rollup``: per-day HLL(user) + KLL(value) sketches,
  re-aggregated to weekly estimates. HLL register state is a max over
  items, so the union of daily sketches is IDENTICAL to a sketch built
  directly on the week (asserted in tests) — merge loses nothing.
- ``theta_overlap``: theta sketches support set ALGEBRA (intersection,
  difference), which HLL cannot; pairwise source contamination becomes
  |sources| sketches + |sources|^2 tiny scalar intersections instead of
  x48's vocabulary-sized shingle self-join.

No reference counterpart (its aggregation surface is pandas sum/mean,
SURVEY §2.4); mandated by the north star's 100 TB efficiency goal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import word_shingles


def kll_merge_fold(col: str | Column, order_col: str | Column = "day") -> Column:
    """Aggregate-merge KLL sketches in a groupBy: Spark exposes only the
    BINARY kll_sketch_merge_double, so fold it over collect_list (group
    cardinality here is bounded — days per week — so the list is tiny).
    The list is sorted by ``order_col`` first: KLL merging is
    order-sensitive, and collect_list order follows partition arrival —
    sorting pins the estimate for a given input.
    """
    o = F.col(order_col) if isinstance(order_col, str) else order_col
    c = F.col(col) if isinstance(col, str) else col
    lst = F.transform(
        F.array_sort(F.collect_list(F.struct(o.alias("o"), c.alias("s")))),
        lambda s: s["s"],
    )
    return F.reduce(
        F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0))),
        F.element_at(lst, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )


def daily_sketches(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    kll_k: int = 800,
    theta_users_lg_k: int | None = None,
) -> DataFrame:
    """The materialize-once layer: one row per day carrying mergeable
    sketch state (HLL users, KLL values) + an exact event count. At scale
    this frame is what you PERSIST; every rollup below reads it, not the
    raw events.

    ``theta_users_lg_k`` switches the user sketch from HLL to THETA at
    the given log2 nominal entries — the x77b exactness-pin recipe
    applied to the ROLLUP's merge path (verdict r12 item 2): a theta
    sketch is exact while the per-group distinct count stays under its
    nominal bound, and a KLL sketch is exact while its retained items
    never compact (``kll_k`` >= the group's row count), so with both
    sized over the test-scale bounds the ENTIRE daily->weekly merge
    algebra returns exact values and is driver-hash-checkable against
    plain SQL (x76b); at production scale the identical plan degrades
    gracefully to the estimates."""
    agg_users = (
        F.hll_sketch_agg(user_col)
        if theta_users_lg_k is None
        else F.theta_sketch_agg(user_col, F.lit(int(theta_users_lg_k)))
    )
    return events.groupBy(F.to_date(ts_col).alias("day")).agg(
        agg_users.alias("user_sk"),
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(int(kll_k))
        ).alias("val_sk"),
        F.count(F.lit(1)).alias("n_events"),
    )


def weekly_rollup(
    daily: DataFrame, theta_users_lg_k: int | None = None
) -> DataFrame:
    """Re-aggregate the daily sketch frame to weeks — no raw-data scan.
    approx_users: HLL union estimate (or theta union when the daily
    frame was built with ``theta_users_lg_k`` — pass the same value
    here); p50/p95: merged-KLL quantiles."""
    merged_kll = kll_merge_fold("val_sk", "day")
    users = (
        F.hll_sketch_estimate(F.hll_union_agg("user_sk"))
        if theta_users_lg_k is None
        else F.theta_sketch_estimate(
            F.theta_union_agg("user_sk", F.lit(int(theta_users_lg_k)))
        )
    )
    return (
        daily.groupBy(
            F.date_trunc("week", F.col("day").cast("timestamp")).alias("week")
        )
        .agg(
            users.alias("approx_users"),
            F.kll_sketch_get_quantile_double(merged_kll, F.lit(0.5)).alias("p50_value"),
            F.kll_sketch_get_quantile_double(merged_kll, F.lit(0.95)).alias("p95_value"),
            F.sum("n_events").alias("n_events"),
        )
    )


def theta_overlap(
    docs: DataFrame,
    by: str = "source",
    n: int = 3,
    text_col: str = "text",
    lg_k: int | None = None,
) -> DataFrame:
    """Estimated distinct-shingle overlap per source pair (x48's exact
    semantics, sketched): one theta sketch per source, fed the raw
    exploded shingle stream — theta sketches count distinct natively, so
    no pre-distinct shuffle; the only shuffle is the |sources|-group
    partial-aggregated sketch merge. Every pair intersection is then a
    scalar op on two kilobyte-scale sketches. The |sources|-row sketch
    frame self-joins for free (broadcast); nothing corpus-sized crosses
    the wire at all.

    ``lg_k`` sets the sketch's log2 nominal entries (engine default
    when None). A theta sketch is EXACT while its per-group distinct
    count stays under the nominal-entries bound — the x77b exactness
    pin sizes lg_k over the bound at test scales, so the whole
    sketch-algebra pipeline (agg, merge, intersection, estimate) is
    driver-hash-checked against x48's exact SQL; at production scale
    the same plan degrades gracefully to the estimate.
    """
    sh = docs.select(
        F.col(by), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    )
    agg = (
        F.theta_sketch_agg("shingle")
        if lg_k is None
        else F.theta_sketch_agg("shingle", lg_k)
    )
    per = sh.groupBy(by).agg(agg.alias("sk"))
    a, b = per.alias("a"), per.alias("b")
    return (
        a.join(F.broadcast(b), F.col(f"a.{by}") < F.col(f"b.{by}"))
        .select(
            F.col(f"a.{by}").alias("source_a"),
            F.col(f"b.{by}").alias("source_b"),
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("a.sk"), F.col("b.sk"))
            ).alias("approx_shared_shingles"),
        )
    )


def daily_top_items(
    events: DataFrame,
    m: int = 20,
    ts_col: str = "ts",
    item_col: str = "user_id",
) -> DataFrame:
    """Mergeable frequent-items summary: per-day exact top-m + threshold.

    The deterministic counterpart of a Misra-Gries/SpaceSaving sketch:
    each day keeps its m highest-count items (exact counts) plus the
    day's threshold t = the m-th kept count — any item ABSENT from the
    day's summary provably had count <= t that day. The (day, item,
    cnt) + (day, t) pair is the state you persist; coarser rollups
    merge summaries with sound error bounds and never rescan raw data.
    Integer arithmetic end-to-end, so the whole pipeline is bit-exact
    and oracle-checkable — unlike CMS/SpaceSaving, whose estimates are
    hash-dependent.

    Returns (day, item, cnt, rnk, t_day). Rank ties break by item id
    (deterministic); days with < m items get t_day = 0 (nothing was
    dropped, bounds are exact).
    """
    from pyspark.sql import Window as W

    day = F.to_date(ts_col).alias("day")
    counts = events.groupBy(day, F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("day").orderBy(F.desc("cnt"), F.asc("item"))
    ranked = counts.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= m
    )
    thresholds = ranked.groupBy("day").agg(
        # m-th kept count if the day filled all m slots, else 0
        F.when(F.max("rnk") >= m, F.min("cnt")).otherwise(F.lit(0)).alias("t_day")
    )
    return ranked.join(thresholds, "day")


def weekly_top_items(daily_top: DataFrame, k: int = 10) -> DataFrame:
    """Merge daily top-m summaries into weekly top-k with error bounds.

    For each (week, item): est = sum of its OBSERVED daily counts
    (a lower bound on the true weekly count); ub = est + the sum of
    t_day over the week's days where the item was absent (it can have
    hidden at most t_day occurrences under each such day's threshold).
    ``guaranteed`` marks items whose lower bound beats every unreported
    item's possible count (total week threshold mass) — the soundness
    statement a consumer needs before trusting the leaderboard.
    """
    from pyspark.sql import Window as W

    week = F.date_trunc("week", F.col("day").cast("timestamp")).alias("week")
    per_item = daily_top.groupBy(week, F.col("item")).agg(
        F.sum("cnt").alias("est"),
        F.sum("t_day").alias("present_t"),
    )
    week_t = (
        daily_top.select(
            F.date_trunc("week", F.col("day").cast("timestamp")).alias("week"),
            "day",
            "t_day",
        )
        .distinct()
        .groupBy("week")
        .agg(F.sum("t_day").alias("total_t"))
    )
    joined = per_item.join(week_t, "week").select(
        "week",
        "item",
        "est",
        (F.col("est") + F.col("total_t") - F.col("present_t")).alias("ub"),
        "total_t",
    )
    w = W.partitionBy("week").orderBy(F.desc("est"), F.asc("item"))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "week",
            "item",
            F.col("est").cast("long").alias("est"),
            F.col("ub").cast("long").alias("ub"),
            F.col("rnk").cast("int").alias("rnk"),
            # an unreported item's weekly count is <= total_t
            (F.col("est") >= F.col("total_t")).alias("guaranteed"),
        )
    )
