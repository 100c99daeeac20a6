from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from azure_serverless_etl_pipeline_spark.session import get_spark

    # Pinned to local[8]: the suite runs sf0.001 fixtures whose stages
    # hold a handful of rows, so parallelism beyond ~8 only adds
    # per-task scheduling overhead — the identical default gate
    # measured 23:44 on local[32] vs ~14 min on local[8] (r14). The
    # bench/driver sessions keep local[$SPARK_GRAFT_CPUS]; this is the
    # test session only.
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    return con
