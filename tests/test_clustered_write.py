"""Range-clustered writes must produce tight, non-overlapping per-file
key ranges (the parquet-footer data-skipping contract), and a filtered
read over the clustered layout must touch fewer row groups."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def clustered_orders(spark, tmp_path_factory):
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.sources.writers import write_clustered

    d = str(tmp_path_factory.mktemp("clustered") / "orders")
    o = load_table(spark, SF_ORACLE, "orders")
    write_clustered(o, d, ["o_orderdate"], n_files=8)
    return d


def _file_ranges(path, col):
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            ranges.append((min(los), max(his)))
    return ranges


def test_clustered_files_have_disjoint_ranges(clustered_orders):
    ranges = _file_ranges(clustered_orders, "o_orderdate")
    assert len(ranges) >= 4  # actually split into multiple files
    ranges.sort()
    # non-overlapping except at the single boundary value repartitionByRange
    # may share between adjacent files
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_point_query_skips_most_rowgroups(spark, clustered_orders):
    """The predicate's matching key range lives in ~1 file: footer stats
    alone must exclude most of the data."""
    ranges = _file_ranges(clustered_orders, "o_orderdate")
    # pick a date strictly inside the first file's range
    target = ranges[0][1]
    covering = [r for r in ranges if r[0] <= target <= r[1]]
    assert len(covering) <= 2  # boundary value may touch its neighbor
    # and Spark reads the clustered layout correctly
    df = spark.read.parquet(clustered_orders)
    exact = df.filter(F.col("o_orderdate") == F.lit(target)).count()
    from azure_serverless_etl_pipeline_spark.sources import load_table

    orig = (
        load_table(spark, SF_ORACLE, "orders")
        .filter(F.col("o_orderdate") == F.lit(target))
        .count()
    )
    assert exact == orig > 0


@pytest.fixture(scope="module")
def zordered_orders(spark, tmp_path_factory):
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.sources.writers import write_zordered

    d = str(tmp_path_factory.mktemp("zordered") / "orders")
    o = load_table(spark, SF_ORACLE, "orders")
    write_zordered(
        o,
        d,
        F.col("o_custkey"),
        F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1992-01-01"))),
        n_files=8,
    )
    return d


def _touched(ranges, lo, hi):
    return sum(1 for flo, fhi in ranges if flo <= hi and fhi >= lo)


def test_zordered_write_prunes_both_dims_in_real_footers(spark, zordered_orders):
    """The z-ordered files' REAL parquet footer stats must be selective
    on BOTH clustered columns — a mid-range probe on either dim skips
    most files, where the linear layout skips only on its leading key."""
    cust = _file_ranges(zordered_orders, "o_custkey")
    assert len(cust) >= 4
    # probe = middle ~10% of each dim's corpus range
    clo = min(r[0] for r in cust)
    chi = max(r[1] for r in cust)
    probe_c = (clo + (chi - clo) * 2 // 5, clo + (chi - clo) * 9 // 20)
    assert _touched(cust, *probe_c) <= len(cust) // 2

    dates = _file_ranges(zordered_orders, "o_orderdate")
    dlo = min(r[0] for r in dates)
    dhi = max(r[1] for r in dates)
    probe_d = (
        dlo + (dhi - dlo) * 2 / 5,
        dlo + (dhi - dlo) * 9 / 20,
    )
    assert _touched(dates, *probe_d) <= len(dates) // 2


def test_zordered_write_preserves_rows(spark, zordered_orders):
    from azure_serverless_etl_pipeline_spark.sources import load_table

    orig = load_table(spark, SF_ORACLE, "orders")
    back = spark.read.parquet(zordered_orders)
    assert back.count() == orig.count()
    assert sorted(back.columns) == sorted(orig.columns)
    # content identity, not just counts
    assert (
        back.select("o_orderkey").exceptAll(orig.select("o_orderkey")).count()
        == 0
    )


@pytest.fixture(scope="module")
def hilbert_orders(spark, tmp_path_factory):
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.sources.writers import write_zordered

    d = str(tmp_path_factory.mktemp("hilbert") / "orders")
    o = load_table(spark, SF_ORACLE, "orders")
    write_zordered(
        o,
        d,
        F.col("o_custkey"),
        F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1992-01-01"))),
        n_files=8,
        curve="hilbert",
    )
    return d


def test_hilbert_write_prunes_both_dims_in_real_footers(spark, hilbert_orders):
    """The Hilbert-clustered files' real parquet footer stats must be
    selective on BOTH dimensions, same contract as the Morton write."""
    cust = _file_ranges(hilbert_orders, "o_custkey")
    assert len(cust) >= 4
    clo = min(r[0] for r in cust)
    chi = max(r[1] for r in cust)
    probe_c = (clo + (chi - clo) * 2 // 5, clo + (chi - clo) * 9 // 20)
    assert _touched(cust, *probe_c) <= len(cust) // 2

    dates = _file_ranges(hilbert_orders, "o_orderdate")
    dlo = min(r[0] for r in dates)
    dhi = max(r[1] for r in dates)
    probe_d = (dlo + (dhi - dlo) * 2 / 5, dlo + (dhi - dlo) * 9 / 20)
    assert _touched(dates, *probe_d) <= len(dates) // 2


def test_hilbert_write_preserves_rows(spark, hilbert_orders):
    from azure_serverless_etl_pipeline_spark.sources import load_table

    orig = load_table(spark, SF_ORACLE, "orders")
    back = spark.read.parquet(hilbert_orders)
    assert back.count() == orig.count()
    assert (
        back.select("o_orderkey").exceptAll(orig.select("o_orderkey")).count()
        == 0
    )
