"""Table catalog over the driver's parquet testdata.

Analog of the reference's document-store access layer
(``function-app/data_analytics_api.py:31`` ``container.query_items``):
instead of a remote scatter-gather scan per API call, each table is a
columnar parquet scan with Catalyst projection/predicate pushdown. On a
real deployment these paths would be cloud-storage URIs (abfss/s3a) and
the hot fact tables would be written ``partitionBy`` their natural key
(the reference partitions by ``/HomeID`` — ``blobToCosmos.py:22``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any scale factor (TPC-H fixed or
# slowly-growing tables). Fact tables are never broadcast.
BROADCAST_SAFE = frozenset({"region", "nation"})


def _ensure_session_conf(spark: SparkSession) -> None:
    """Settings correctness depends on, applied defensively: the caller
    (e.g. the round driver) may hand us a session built without them.
    All three are runtime SQL confs — safe to set on a live session."""
    for k, v in (
        # events.parquet stores TIMESTAMP(NANOS); the default reader errors
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # oracle comparisons assume UTC-naive timestamps (DuckDB semantics)
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.sources.partitionColumnTypeInference.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static/locked conf: keep going with the session's value


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; available: {TABLES}")
    _ensure_session_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): read as long nanos (session
    # config nanosAsLong) and floor-convert to a microsecond timestamp —
    # the same truncation DuckDB applies, so oracle comparisons align.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view so queries can use spark.sql."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
