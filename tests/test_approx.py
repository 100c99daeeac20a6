"""Approximate-aggregate accuracy: sketches within tolerance of exact."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_approx_distinct_within_tolerance(spark):
    from azure_serverless_etl_pipeline_spark.plans import all_queries

    pdf = all_queries()["x30_approx_aggregates"](spark, SF_ORACLE).toPandas()
    # HLL++ default rsd=5%; allow 10% slack on small groups
    rel_err = (pdf["approx_orders"] - pdf["exact_orders"]).abs() / pdf["exact_orders"]
    assert (rel_err < 0.10).all(), rel_err
    # quantiles are ordered and within the column's range (scalar columns:
    # the driver's canonicalizer can't hash arrays — round-1 x30 failure)
    for _, row in pdf.iterrows():
        qs = [row["p50_approx"], row["p95_approx"], row["p99_approx"]]
        assert qs == sorted(qs)
        assert qs[0] > 0


def test_sketch_rollup_accuracy_and_mergeability(spark):
    """Weekly estimates from merged DAILY sketches: HLL distinct within
    2% of exact (and identical to a direct weekly sketch — union loses
    nothing), KLL quantiles within 5% relative of exact percentiles."""
    from pyspark.sql import functions as F

    from azure_serverless_etl_pipeline_spark.operators import sketches
    from azure_serverless_etl_pipeline_spark.sources import load_table

    ev = load_table(spark, SF_ORACLE, "events")
    rolled = {
        r["week"]: r
        for r in sketches.weekly_rollup(sketches.daily_sketches(ev)).collect()
    }
    exact = {
        r["week"]: r
        for r in ev.groupBy(F.date_trunc("week", "ts").alias("week"))
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile(F.col("value").cast("double"), 0.5).alias("p50"),
            F.percentile(F.col("value").cast("double"), 0.95).alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    direct = {
        r["week"]: r["users"]
        for r in ev.groupBy(F.date_trunc("week", "ts").alias("week"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("users"))
        .collect()
    }
    assert rolled.keys() == exact.keys()
    for wk, r in rolled.items():
        e = exact[wk]
        assert r["n_events"] == e["n"]  # counts are exact, not sketched
        assert abs(r["approx_users"] - e["users"]) <= max(0.02 * e["users"], 1)
        # merged-daily HLL == direct weekly HLL (register max is order-free)
        assert r["approx_users"] == direct[wk]
        assert abs(r["p50_value"] - e["p50"]) <= 0.05 * abs(e["p50"])
        assert abs(r["p95_value"] - e["p95"]) <= 0.05 * abs(e["p95"])


def test_theta_overlap_vs_exact(spark):
    """Theta-sketch pair overlaps track x48's exact shared-shingle counts:
    same pair set, estimates within 5% + a small absolute slack."""
    from azure_serverless_etl_pipeline_spark.operators import sketches
    from azure_serverless_etl_pipeline_spark.plans import all_queries
    from azure_serverless_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    est = {
        (r["source_a"], r["source_b"]): r["approx_shared_shingles"]
        for r in sketches.theta_overlap(docs).collect()
    }
    exact = {
        (r["source_a"], r["source_b"]): r["n_shared_shingles"]
        for r in all_queries()["x48_cross_source_overlap"](spark, SF_ORACLE).collect()
    }
    # x48 omits pairs with zero shared shingles; theta emits every pair
    assert set(exact) <= set(est)
    for pair, n in exact.items():
        assert abs(est[pair] - n) <= max(0.05 * n, 2.0), (pair, est[pair], n)


def test_mergeable_topk_bounds_sound(spark):
    """daily_top_items -> weekly_top_items: est must LOWER-bound and ub
    UPPER-bound the true weekly count for every reported item, and
    `guaranteed` items must truly outrank every unreported item."""
    from pyspark.sql import functions as F

    from azure_serverless_etl_pipeline_spark.operators import sketches
    from azure_serverless_etl_pipeline_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    out = sketches.weekly_top_items(sketches.daily_top_items(ev, m=5), k=10).collect()
    truth = {
        (r.week, r.item): r.true_cnt
        for r in ev.groupBy(
            F.date_trunc("week", F.col("ts").cast("timestamp")).alias("week"),
            F.col("user_id").alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .collect()
    }
    per_week_max_unreported = {}
    reported = {(r.week, r.item) for r in out}
    for (wk, it), cnt in truth.items():
        if (wk, it) not in reported:
            per_week_max_unreported[wk] = max(per_week_max_unreported.get(wk, 0), cnt)
    assert out
    for r in out:
        t = truth[(r.week, r.item)]
        assert r.est <= t <= r.ub, (r, t)
        if r.guaranteed:
            assert t >= per_week_max_unreported.get(r.week, 0)
