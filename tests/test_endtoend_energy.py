"""Entry-point lifecycles end-to-end on the energy domain (SURVEY.md §3):
ingest CSV -> partitioned lake -> per-home anomaly features -> scoring ->
JSON serving; and the Forecast path on the densified daily series."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.energy_fixtures import write_clean_csv


@pytest.fixture(scope="module")
def energy_lake(spark, tmp_path_factory):
    from azure_serverless_etl_pipeline_spark.operators.ingest import ingest_energy_csv
    from azure_serverless_etl_pipeline_spark.sources.writers import write_partitioned

    tmp = tmp_path_factory.mktemp("energy_e2e")
    write_clean_csv(tmp / "upload.csv", n=2000, seed=7)
    res = ingest_energy_csv(spark, str(tmp / "upload.csv"))
    lake = str(tmp / "lake")
    write_partitioned(res.valid, lake, ("HomeID",), mode="overwrite")
    return lake


def test_detect_anomalies_lifecycle(spark, energy_lake):
    """§3.2: scan(pushed filters) -> groupBy(home,date) -> densify ->
    rolling features -> pandas-UDF scoring -> JSON, as ONE lazy plan."""
    from azure_serverless_etl_pipeline_spark.functions import to_date_ddmmyyyy
    from azure_serverless_etl_pipeline_spark.ml.scoring import score_anomalies
    from azure_serverless_etl_pipeline_spark.operators.timeseries import (
        densify_daily,
        rolling_features,
    )
    from azure_serverless_etl_pipeline_spark.serving import to_json_response

    df = spark.read.parquet(energy_lake)
    # the reference pushes only HomeID; we push the date range too
    daily = (
        df.withColumn("date", to_date_ddmmyyyy("Date"))
        .filter((F.col("date") >= "2023-01-01") & (F.col("date") <= "2023-06-30"))
        .groupBy("HomeID", "date")
        .agg(
            F.sum("EnergyConsumption").alias("total_kwh"),
            F.countDistinct("ApplianceType").alias("unique_appliances"),
        )
    )
    dense = densify_daily(daily, "date", ["HomeID"], ["total_kwh", "unique_appliances"])
    feats = rolling_features(dense, "date", "total_kwh", ["HomeID"])
    scored = score_anomalies(feats, value_col="total_kwh")

    pdf = scored.toPandas()
    assert {"HomeID", "date", "total_kwh", "rolling_7_mean", "dow", "score",
            "anomaly"} <= set(pdf.columns)
    # densified: per home, days form a continuous range
    import pandas as pd

    pdf["date"] = pd.to_datetime(pdf["date"])
    span = pdf.groupby("HomeID")["date"].agg(["min", "max", "count"])
    assert ((span["max"] - span["min"]).dt.days + 1 == span["count"]).all()
    # zero-filled days present and scored (the model never sees NULLs)
    assert pdf["total_kwh"].isna().sum() == 0
    assert pdf["score"].isna().sum() == 0

    # serving edge: JSON with stringified dates (reference default=str)
    payload = json.loads(to_json_response(scored.limit(5)))
    assert len(payload) == 5 and "score" in payload[0]


def test_forecast_lifecycle(spark, energy_lake):
    """§3.3: daily series -> densify -> per-home forecast via
    applyInPandas (the reference's global Prophet generalized per key)."""
    from azure_serverless_etl_pipeline_spark.functions import to_date_ddmmyyyy
    from azure_serverless_etl_pipeline_spark.ml.forecast import forecast_daily
    from azure_serverless_etl_pipeline_spark.operators.timeseries import densify_daily

    df = spark.read.parquet(energy_lake)
    daily = (
        df.withColumn("date", to_date_ddmmyyyy("Date"))
        .groupBy("HomeID", "date")
        .agg(F.sum("EnergyConsumption").alias("total_kwh"))
    )
    dense = densify_daily(daily, "date", ["HomeID"], ["total_kwh"])
    fc = forecast_daily(
        dense, periods=7, value_col="total_kwh", key_cols=("HomeID",)
    ).toPandas()
    n_homes = dense.select("HomeID").distinct().count()
    assert len(fc) == 7 * n_homes
    assert (fc["yhat_lower"] <= fc["yhat_upper"]).all()


def test_homeid_pruning_lifecycle(spark, energy_lake):
    """The partition-key promise: HomeID equality prunes to one partition
    (the Cosmos partition-key role, SURVEY.md X-3)."""
    df = spark.read.parquet(energy_lake)
    home = df.limit(1).collect()[0]["HomeID"]
    plan = (
        df.filter(F.col("HomeID") == home)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    n_all = df.select("HomeID").distinct().count()
    assert df.filter(F.col("HomeID") == home).count() < df.count()
    assert n_all > 1
