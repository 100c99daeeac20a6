"""The §4.4 correctness quirks: zero-fill, shrinking rolling frame
(min_periods=1), Monday=0 dow — asserted against a pandas reference, the
way the reference computes them (ml_forecast_anomaly.py:199-212)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sparse_daily(spark):
    rows = [
        ("h1", "2023-01-01", 1.0),
        ("h1", "2023-01-03", 2.0),  # gap on the 2nd
        ("h1", "2023-01-10", 5.0),  # week-long gap
        ("h2", "2023-02-10", 3.0),  # different range per key
        ("h2", "2023-02-12", 4.0),
    ]
    return spark.createDataFrame(rows, "home_id string, d string, v double").select(
        "home_id", F.to_date("d").alias("date"), F.col("v")
    )


def test_spine_and_zero_fill(spark, sparse_daily):
    from azure_serverless_etl_pipeline_spark.operators.timeseries import densify_daily

    dense = densify_daily(sparse_daily, "date", ["home_id"], ["v"]).toPandas()
    h1 = dense[dense.home_id == "h1"].sort_values("date")
    assert len(h1) == 10  # Jan 1..10 inclusive
    assert h1["v"].tolist()[0] == 1.0
    assert h1["v"].tolist()[1] == 0.0  # zero-fill, not NULL
    assert h1["v"].isna().sum() == 0
    h2 = dense[dense.home_id == "h2"].sort_values("date")
    assert len(h2) == 3  # per-key bounds, not global


def test_rolling_matches_pandas(spark, sparse_daily):
    from azure_serverless_etl_pipeline_spark.operators.timeseries import (
        densify_daily,
        rolling_features,
    )

    dense = densify_daily(sparse_daily, "date", ["home_id"], ["v"])
    feats = rolling_features(dense, "date", "v", ["home_id"]).toPandas()
    feats = feats.sort_values(["home_id", "date"], ignore_index=True)

    pdf = dense.toPandas().sort_values(["home_id", "date"], ignore_index=True)
    expected = (
        pdf.groupby("home_id")["v"]
        .transform(lambda x: x.rolling(7, min_periods=1).mean())
    )
    assert (feats["rolling_7_mean"] - expected).abs().max() < 1e-12

    # pandas Monday=0 convention (reference ml_forecast_anomaly.py:212)
    exp_dow = pd.to_datetime(pdf["date"]).dt.dayofweek
    assert (feats["dow"] == exp_dow).all()


def test_global_spine_no_keys(spark, sparse_daily):
    from azure_serverless_etl_pipeline_spark.operators.timeseries import densify_daily

    one = sparse_daily.filter("home_id = 'h1'").drop("home_id")
    dense = densify_daily(one, "date", [], ["v"]).toPandas()
    assert len(dense) == 10
    assert dense["v"].sum() == 8.0  # zero-filled days contribute nothing
