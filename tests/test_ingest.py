"""Batch ingest semantics vs the reference transform (blobToCosmos.py):
header normalization, cast-failure->NULL->drop, skip counting, uuid ids.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from tests.energy_fixtures import write_clean_csv, write_dirty_csv


@pytest.fixture(scope="module")
def clean_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("ingest") / "clean.csv"
    write_clean_csv(p)
    return p


@pytest.fixture(scope="module")
def dirty_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("ingest") / "dirty.csv"
    expect = write_dirty_csv(p)
    return p, expect


def test_header_normalization():
    from azure_serverless_etl_pipeline_spark.operators.ingest import normalize_header

    assert normalize_header(" Home ID ") == "homeid"
    assert normalize_header("Energy Consumption (kWh)") == "energyconsumption"
    assert normalize_header("Outdoor Temperature (°C)") == "outdoortemperature"
    assert normalize_header("Household Size") == "householdsize"


def test_clean_ingest(spark, clean_csv):
    from azure_serverless_etl_pipeline_spark.operators.ingest import ingest_energy_csv

    res = ingest_energy_csv(spark, str(clean_csv))
    valid = res.valid.toPandas()
    assert len(valid) == 500
    assert res.quarantine.count() == 0
    # document shape: 6 projected fields + id; Time/OutdoorTemp dropped
    assert sorted(valid.columns) == sorted(
        ["HomeID", "ApplianceType", "EnergyConsumption", "Season", "Date",
         "HouseholdSize", "id"]
    )
    # uuid per row, unique
    assert valid["id"].nunique() == 500
    # HomeID stays a string (reference compares it as string)
    assert valid["HomeID"].map(type).eq(str).all()
    # energy parsed to float in range
    assert valid["EnergyConsumption"].between(0.1, 5.0).all()


def test_dirty_ingest_counts(spark, dirty_csv):
    from azure_serverless_etl_pipeline_spark.operators.ingest import ingest_energy_csv

    path, expect = dirty_csv
    res = ingest_energy_csv(spark, str(path))
    n_valid = res.valid.count()
    n_quar = res.quarantine.count()
    assert n_valid == expect["valid"]
    assert n_quar == expect["skipped"]
    # malformed household size -> NULL but row kept (not in the validation
    # predicate, blobToCosmos.py:73-75)
    kept_null_house = res.valid.filter("HouseholdSize IS NULL").count()
    assert kept_null_house == expect["null_household_kept"]


def test_observe_counters(spark, dirty_csv):
    from azure_serverless_etl_pipeline_spark.operators.ingest import (
        energy_transform,
        normalize_columns,
        observed_ingest,
    )

    path, expect = dirty_csv
    raw = spark.read.option("header", True).csv(str(path))
    observed = observed_ingest(energy_transform(normalize_columns(raw)), "m")
    from pyspark.sql import Observation  # noqa: F401  (API presence)

    collected = observed.collect()
    assert len(collected) == expect["total"]


def test_partitioned_write_and_upsert(spark, clean_csv, tmp_path):
    from azure_serverless_etl_pipeline_spark.operators.ingest import ingest_energy_csv
    from azure_serverless_etl_pipeline_spark.sources.writers import (
        upsert_parquet,
        write_partitioned,
    )

    res = ingest_energy_csv(spark, str(clean_csv))
    out = str(tmp_path / "energy")
    write_partitioned(res.valid, out, ("HomeID",), mode="overwrite")
    back = spark.read.parquet(out)
    assert back.count() == 500
    # partition pruning: HomeID equality should read a subset of files
    some_home = back.limit(1).collect()[0]["HomeID"]
    pruned = back.filter(back.HomeID == some_home)
    assert 0 < pruned.count() < 500

    # upsert: re-delivering the same batch must not duplicate (T-3)
    flat = str(tmp_path / "flat")
    first = res.valid.localCheckpoint(eager=True)  # freeze uuids
    first.write.mode("overwrite").parquet(flat)
    upsert_parquet(spark, first, flat, key="id")
    assert spark.read.parquet(flat).count() == 500


def test_scd2_apply_row_fates(spark):
    """All five SCD2 row fates on a handcrafted dimension: closed history
    is immutable, unchanged-open and no-update-open rows pass through,
    changed rows close at the update ts and re-open as a new version,
    identical re-delivery is a no-op, unseen keys insert; only the
    latest update per key applies."""
    import datetime as dt

    from azure_serverless_etl_pipeline_spark.sources.writers import scd2_apply

    T = dt.datetime
    current = spark.createDataFrame(
        [
            # key 1: one closed historic version + one open (will change)
            (1, 10.0, "A", T(2020, 1, 1), T(2022, 1, 1)),
            (1, 11.0, "A", T(2022, 1, 1), None),
            # key 2: open, update re-sends identical attrs -> no-op
            (2, 20.0, "B", T(2020, 1, 1), None),
            # key 3: open, no update -> untouched
            (3, 30.0, "C", T(2020, 1, 1), None),
        ],
        "k long, bal double, seg string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [
            (1, 12.0, "A", T(2023, 1, 1)),   # stale update (superseded)
            (1, 13.0, "A", T(2024, 1, 1)),   # latest wins
            (2, 20.0, "B", T(2024, 1, 1)),   # identical -> no-op
            (9, 90.0, "Z", T(2024, 1, 1)),   # unseen key -> insert
        ],
        "k long, bal double, seg string, ts timestamp",
    )
    out = scd2_apply(
        current, updates, key="k", ts_col="ts", attrs=["bal", "seg"]
    ).toPandas()
    rows = {
        (r.k, r.bal, str(r.valid_from.date()),
         None if r.valid_to is None or r.valid_to != r.valid_to
         else str(r.valid_to.date()))
        for r in out.itertuples()
    }
    assert rows == {
        (1, 10.0, "2020-01-01", "2022-01-01"),  # history immutable
        (1, 11.0, "2022-01-01", "2024-01-01"),  # closed at latest ts
        (1, 13.0, "2024-01-01", None),          # new version (not 12.0)
        (2, 20.0, "2020-01-01", None),          # identical -> untouched
        (3, 30.0, "2020-01-01", None),          # no update -> untouched
        (9, 90.0, "2024-01-01", None),          # insert
    }
    # idempotent re-delivery: applying the same batch again changes nothing
    again = scd2_apply(
        spark.createDataFrame(out), updates, key="k", ts_col="ts",
        attrs=["bal", "seg"],
    ).toPandas()
    assert len(again) == len(out)
