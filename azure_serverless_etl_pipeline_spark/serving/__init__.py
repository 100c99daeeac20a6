"""Thin serving layer: named queries -> JSON (reference S-10/S-12).

The reference exposes 5 HTTP endpoints that execute a store query plus
pandas post-processing and return ``json.dumps(items, default=str)``
(``data_analytics_api.py:34-38``). The engine keeps the API layer thin:
a registry lookup runs the named DataFrame plan and serializes at the
edge. Parameterized filters are bound as columns — never interpolated
into SQL text (the reference's f-string injection at
``data_analytics_api.py:67`` is replicated in semantics, not in risk).
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import all_queries


def run_named_query(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    filters: dict[str, object] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Execute a registry query with optional bound equality filters.

    Filters apply to output columns (post-aggregation), mirroring the
    reference's optional ``WHERE c.HomeID = @homeid`` parameter
    (``ml_forecast_anomaly.py:162-167``); Catalyst pushes them down
    through the plan where legal.
    """
    queries: dict[str, Callable] = all_queries()
    if name not in queries:
        raise KeyError(f"unknown query {name!r}; available: {sorted(queries)}")
    df = queries[name](spark, sf_dir)
    for col, val in (filters or {}).items():
        df = df.filter(F.col(col) == F.lit(val))
    if limit is not None:
        df = df.limit(limit)
    return df


def run_sql(spark: SparkSession, sql: str, args: dict[str, object] | None = None) -> DataFrame:
    """Parameterized SQL entry point (F-13): named parameters are bound by
    the engine (``spark.sql(query, args=...)``, Spark >= 3.4), never
    interpolated into the statement — the injection-safe replacement for
    the reference's f-string WHERE clause (data_analytics_api.py:67).
    Tables from the catalog must be registered first (register_views).
    """
    return spark.sql(sql, args=args or {})


def to_json_response(df: DataFrame, max_rows: int = 10_000) -> str:
    """Serialize at the API edge (S-12). ``default=str`` mirrors the
    reference's date handling (``data_analytics_api.py:35``); max_rows
    bounds driver materialization (the reference pages nothing and
    collects entire cross-partition scans)."""
    rows = [r.asDict(recursive=True) for r in df.limit(max_rows).collect()]
    return json.dumps(rows, default=str)
