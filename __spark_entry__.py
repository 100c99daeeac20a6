"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (the reference's most
complex path — the DetectAnomalies feature pipeline, SURVEY.md §3.2 —
re-expressed as one distributed plan). ``queries()`` / ``oracle_sql()``
expose the full corpus from azure_serverless_etl_pipeline_spark.plans.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from azure_serverless_etl_pipeline_spark.deploy import ship_package  # noqa: E402
from azure_serverless_etl_pipeline_spark.plans import all_oracles, all_queries  # noqa: E402


def _shipped(fn: Callable) -> Callable:
    """Wrap a query callable so the package zip is registered with the
    session's SparkContext before the first worker-side UDF closure
    runs (deploy.ship_package — once per context): the driver contract
    then holds from ANY working directory, not just the repo root."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ship_package(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    g08: scan -> groupBy(user, day) -> date-spine densify -> rolling-7
    window + dow — the reference's anomaly feature frame
    (ml_forecast_anomaly.py:193-212) as a single Catalyst plan.
    """
    ship_package(spark)
    return all_queries()["g08_rolling_features"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (G1..G10) plus
    the north-star extensions (x..) and ML scorers (m.., rows-only)."""
    return {n: _shipped(fn) for n, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; engine-hash-dependent
    ops (minhash/simhash/LSH/fingerprint) and model scorers are omitted ->
    rows-only check, covered by pytest against pure-Python references."""
    return all_oracles()
