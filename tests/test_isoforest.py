"""Unit invariants for ml/isoforest — the deterministic isolation-forest
artifact behind x123 (reference M-2's oracle-backed twin). The full
Spark-vs-DuckDB parity run lives in test_queries_oracle (x123)."""

from __future__ import annotations

import numpy as np

from azure_serverless_etl_pipeline_spark.ml import isoforest


def test_artifact_reproducible():
    assert isoforest.build_trees() == isoforest.build_trees()
    assert isoforest.training_sample() == isoforest.training_sample()


def test_depth_bounds_and_variance():
    rng = np.random.default_rng(7)
    x = np.column_stack(
        [
            rng.integers(1, 11, 500),
            rng.integers(1, 6, 500),
            rng.integers(0, 24, 500),
            rng.integers(0, 7, 500),
        ]
    )
    d = isoforest.score_paths(x, isoforest.build_trees())
    assert d.min() >= 0
    assert d.max() <= isoforest.N_TREES * isoforest.MAX_DEPTH
    assert d.std() > 0  # the ensemble must actually discriminate


def test_outliers_isolate_earlier():
    trees = isoforest.build_trees()
    bulk = np.array([[2, 2, 17, 3], [3, 1, 19, 5], [1, 1, 15, 0]])
    odd = np.array([[30, 1, 2, 3], [9, 9, 0, 5], [25, 8, 23, 6]])
    assert isoforest.score_paths(odd, trees).mean() < (
        isoforest.score_paths(bulk, trees).mean()
    )


def test_sql_compilation_matches_numpy():
    import duckdb

    trees = isoforest.build_trees()
    rng = np.random.default_rng(11)
    x = np.column_stack(
        [
            rng.integers(0, 40, 200),
            rng.integers(0, 12, 200),
            rng.integers(0, 24, 200),
            rng.integers(0, 7, 200),
        ]
    )
    want = isoforest.score_paths(x, trees)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE f(n_events BIGINT, n_types BIGINT, max_hour BIGINT, dow BIGINT)"
    )
    con.executemany("INSERT INTO f VALUES (?,?,?,?)", [list(map(int, r)) for r in x])
    got = np.array(
        [
            r[0]
            for r in con.execute(
                f"SELECT {isoforest.tree_sum_sql()} FROM f"
            ).fetchall()
        ]
    )
    assert (want == got).all()
