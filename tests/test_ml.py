"""ML scoring invariants (no SQL oracle — reference-style contracts):
forecast horizon/columns, anomaly flags vs the z-score definition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_forecast_contract(spark):
    from azure_serverless_etl_pipeline_spark.plans import all_queries

    fc = all_queries()["m02_forecast"](spark, SF_ORACLE).toPandas()
    assert len(fc) == 14  # horizon = periods days
    assert sorted(fc.columns) == sorted(
        ["group_key", "ds", "yhat", "yhat_lower", "yhat_upper"]
    )
    assert (fc["yhat_lower"] <= fc["yhat"]).all()
    assert (fc["yhat"] <= fc["yhat_upper"]).all()
    # forecast starts the day after the series ends, consecutive days
    ds = fc.sort_values("ds")["ds"]
    assert (ds.diff().dropna().dt.days == 1).all()


def test_forecast_per_key(spark):
    from azure_serverless_etl_pipeline_spark.ml.forecast import forecast_daily
    from azure_serverless_etl_pipeline_spark.operators.timeseries import densify_daily
    from azure_serverless_etl_pipeline_spark.sources import load_table

    ev = load_table(spark, SF_ORACLE, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("date")).agg(
        F.sum("value").alias("total_value")
    )
    dense = densify_daily(daily, "date", ["user_id"], ["total_value"])
    n_users = dense.select("user_id").distinct().count()
    fc = forecast_daily(dense, periods=7, key_cols=("user_id",))
    pdf = fc.toPandas()
    assert len(pdf) == 7 * n_users
    assert pdf.groupby("user_id").size().eq(7).all()


def test_anomaly_scoring(spark):
    from azure_serverless_etl_pipeline_spark.plans import all_queries

    scored = all_queries()["m01_anomaly_scores"](spark, SF_ORACLE).toPandas()
    assert {"score", "anomaly"} <= set(scored.columns)
    assert (scored["score"] <= 0).all()  # -|z| convention (higher = more normal)
    # anomaly == score below -3 (z threshold), both derived from same z
    assert ((scored["score"] < -3) == scored["anomaly"]).all()
    # anomalies should be rare on smooth synthetic data
    assert scored["anomaly"].mean() < 0.2


def test_scoring_deterministic(spark):
    from azure_serverless_etl_pipeline_spark.plans import all_queries

    a = all_queries()["m01_anomaly_scores"](spark, SF_ORACLE).toPandas()
    b = all_queries()["m01_anomaly_scores"](spark, SF_ORACLE).toPandas()
    key = ["user_id", "date"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    assert a.equals(b)
