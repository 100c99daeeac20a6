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
