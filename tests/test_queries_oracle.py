"""Replicates the driver's correctness gate: every query with an oracle is
run on Spark and DuckDB and compared on row count + schema (column names)
+ order-insensitive values.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_ORACLE


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates come back as datetime.date from both engines
            df[c] = df[c].astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def _assert_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f":
            both_nan = sv.isna() & dv.isna()
            close = pd.Series(
                [
                    (a == b) or (isinstance(a, float) and isinstance(b, float)
                                 and math.isclose(a, b, rel_tol=0, abs_tol=0))
                    for a, b in zip(sv, dv)
                ]
            )
            ok = (both_nan | close).all()
        else:
            ok = sv.equals(dv)
        assert ok, f"{name}: column {c} differs\nspark:\n{sv.head(20)}\nduck:\n{dv.head(20)}"


def _oracle_names():
    from azure_serverless_etl_pipeline_spark.plans import all_oracles_full

    return sorted(all_oracles_full())


# the per-sf_dir-state probes whose oracle check costs >= 15 s each even
# at sf0.001 (index/stream state built on first touch): marked `slow` so
# the default gate fits the driver budget — the driver's own 50-query
# oracle sweep still covers the window rows, and `-m slow` runs these
_SLOW_ORACLES = {
    "x148_dedup_stream_update",
    "x149_ivfpq_split_probe",
    "x150_ivfpq_refit_probe",
    "x151_ivfpq_residual_probe",
    "x152_ivfpq_compact_weighted_refit_probe",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLES else n
        for n in _oracle_names()
    ],
)
def test_query_matches_oracle(spark, duck, name):
    from azure_serverless_etl_pipeline_spark.plans import all_oracles_full, all_queries

    sdf = all_queries()[name](spark, SF_ORACLE).toPandas()
    ddf = duck.execute(all_oracles_full()[name]).df()
    _assert_match(sdf, ddf, name)


def test_every_oracle_has_query():
    from azure_serverless_etl_pipeline_spark.plans import all_oracles_full, all_queries

    missing = set(all_oracles_full()) - set(all_queries())
    assert not missing, f"oracles without queries: {missing}"


# Round-5 exception list (VERDICT r4 item 1): the six rows-only queries
# rotated INTO the window so the driver's row-count signal covers them —
# the only registry entries that had never earned any driver row. Every
# other window slot must stay oracle-backed.
WINDOW_ROWS_ONLY = {
    # x75's slot became the hash slot x75b in round 8 (exact re-rank
    # over a corpus-wide shortlist == brute force); the approximate
    # path stays registered in the extras, benched for RECALL.md.
    # x99 converted to a HASH slot in round 9 (VERDICT r8 item 2): its
    # five stages were each individually oracle-verified, so the
    # composed oracle is their concatenation as one CTE chain. x77's
    # slot became the hash slot x77b the same round (exact-mode theta
    # sketches == x48's exact SQL); x77's engine-default estimate path
    # stays in the extras, tolerance-tested and benched.
    # Round 10 (VERDICT r9 item 2): x79's slot became the hash slot
    # x79b — a deterministic sign-bit hyperplane quantizer makes the
    # cell table SQL-expressible, so the whole SemDeDup downstream is
    # driver-hashed via a recursive-CTE oracle; x79's k-means-fit path
    # stays in the extras, composition-invariant-tested and benched.
    # x76/x78 are ESTIMATE-VALUED (theta/HLL sketch outputs) and stay
    # rows-only by nature; their mechanics are hash-pinned by x77b and
    # tolerance-tested in pytest.
    "x76_sketch_rollup",
    "x78_table_profile_approx",
}


def test_driver_window_contract():
    """The driver checks exactly the first 50 queries() entries: every one
    of those must be oracle-backed except the designated rows-only set
    (WINDOW_ROWS_ONLY — rotated in deliberately for the driver's weaker
    row-count check), and every driver-visible oracle must sit inside the
    window."""
    from azure_serverless_etl_pipeline_spark.plans import (
        DRIVER_WINDOW,
        all_oracles,
        all_queries,
    )

    names = list(all_queries())
    assert names[:50] == DRIVER_WINDOW
    assert len(DRIVER_WINDOW) == 50
    window = set(DRIVER_WINDOW)
    oracles = set(all_oracles())
    missing = window - oracles - WINDOW_ROWS_ONLY
    assert missing == set(), f"window entries without oracle: {missing}"
    assert oracles <= window, f"oracles outside driver window: {oracles - window}"


@pytest.mark.slow
def test_no_array_columns_in_window_output(spark):
    """The driver's rows-only canonicalizer cannot hash array/map cells
    (round-1 x30 failure); no window query may emit one."""
    from pyspark.sql.types import ArrayType, MapType

    from azure_serverless_etl_pipeline_spark.plans import DRIVER_WINDOW, all_queries

    q = all_queries()
    for name in DRIVER_WINDOW:
        schema = q[name](spark, SF_ORACLE).schema
        bad = [
            f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType))
        ]
        assert not bad, f"{name}: non-hashable columns {bad}"


@pytest.mark.slow
def test_rows_only_queries_run(spark):
    """Queries without an oracle must still run and return a stable schema."""
    from azure_serverless_etl_pipeline_spark.plans import all_oracles_full, all_queries

    for name, fn in all_queries().items():
        if name in all_oracles_full():
            continue
        df = fn(spark, SF_ORACLE)
        assert df.columns, name
        assert df.count() >= 0, name


@pytest.mark.slow
def test_all_queries_run_at_smallest_scale(spark):
    """Every registry query must execute at sf0.001 (tiny/empty-partition
    edge cases: empty new-batch in x45, <k neighbors in ANN, single-row
    groups) and return a stable schema."""
    from azure_serverless_etl_pipeline_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    for name, fn in sorted(all_queries().items()):
        df = fn(spark, sf)
        n = df.count()
        assert n >= 0, name
        assert len(df.columns) > 0, name
