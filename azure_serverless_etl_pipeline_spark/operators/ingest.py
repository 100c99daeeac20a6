"""The reference's ETL transform (the "T"), Spark-first.

Re-expresses ``function-app/blobToCosmos.py:32-81`` — header
normalization, project/rename, null-on-error numeric casts, NOT-NULL
validation with skip counting, uuid id — as one declarative plan:
parse -> project -> cast -> filter fuses into a single
whole-stage-codegen pass, and the per-row ``create_item`` network loop
(the reference's 400 RU/s bottleneck, ``blobToCosmos.py:77``) becomes a
bulk partitioned columnar write.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import try_double, try_int

# Target document schema (blobToCosmos.py:53-70): CSV header -> (doc field,
# cast). Time and Outdoor Temperature are dropped (P-2).
ENERGY_FIELDS: dict[str, tuple[str, str]] = {
    "homeid": ("HomeID", "string"),
    "appliancetype": ("ApplianceType", "string"),
    "energyconsumption": ("EnergyConsumption", "double"),
    "season": ("Season", "string"),
    "date": ("Date", "string"),
    "householdsize": ("HouseholdSize", "int"),
}


def normalize_header(name: str) -> str:
    """strip/lowercase/despace/strip-unit-suffix (blobToCosmos.py:39-42).

    The reference removes the literal suffixes ``(kWh)`` and the degree
    variants; we generalize to any trailing parenthesized unit.
    """
    s = name.strip().lower()
    s = re.sub(r"\([^)]*\)", "", s)  # strip unit suffixes like (kWh), (°C)
    s = re.sub(r"\s+", "", s)
    return s


def normalize_columns(df: DataFrame) -> DataFrame:
    """Driver-side rename of all columns to normalized form (P-3)."""
    return df.toDF(*[normalize_header(c) for c in df.columns])


def energy_transform(raw: DataFrame) -> DataFrame:
    """Project/rename/cast the normalized raw frame to the document shape.

    Cast semantics match the reference exactly (F-2/F-3): malformed
    numeric -> NULL (Python ``float()``/``int()`` with except->None);
    a *missing column* would have defaulted to 0.0 for energy
    (``blobToCosmos.py:63``) but the fixed schema makes that case
    unreachable (SURVEY.md §4.4.5). ``id`` is uuid4-per-row (F-4).
    """
    cols: list[Column] = []
    for src, (dst, typ) in ENERGY_FIELDS.items():
        c = F.col(src)
        if typ == "double":
            c = try_double(c)
        elif typ == "int":
            c = try_int(c)
        cols.append(c.alias(dst))
    return raw.select(*cols, F.expr("uuid()").alias("id"))


def valid_predicate() -> Column:
    """NOT-NULL/non-empty validation (blobToCosmos.py:73-75). Built lazily:
    Column construction needs an active SparkContext."""
    return (
        F.col("HomeID").isNotNull()
        & (F.col("HomeID") != "")
        & F.col("ApplianceType").isNotNull()
        & (F.col("ApplianceType") != "")
        & F.col("EnergyConsumption").isNotNull()
    )


@dataclass
class IngestResult:
    valid: DataFrame
    quarantine: DataFrame


def validate_split(transformed: DataFrame) -> IngestResult:
    """Split into valid rows and a quarantine stream (T-4 dead-letter).

    The reference silently drops invalid rows and keeps only a counter
    (``blobToCosmos.py:73-75,81``); at scale a quarantine sink is the
    difference between debuggable and lossy ingest, so we keep both, and
    counts fall out of either side's metrics (see observed_ingest).
    """
    pred = valid_predicate()
    return IngestResult(
        valid=transformed.filter(pred),
        quarantine=transformed.filter(~pred | pred.isNull()),
    )


def observed_ingest(transformed: DataFrame, name: str = "ingest") -> DataFrame:
    """Attach transformed/valid/skipped counters via df.observe — the
    engine analog of the reference's per-row tallies
    (``blobToCosmos.py:49-50,74,78``): zero extra passes, metrics appear
    on the QueryExecution listener after any action.
    """
    pred = valid_predicate()
    return transformed.observe(
        name,
        F.count(F.lit(1)).alias("transformed_count"),
        F.count(F.when(pred, 1)).alias("valid_count"),
        F.count(F.when(~pred | pred.isNull(), 1)).alias("skipped_count"),
    )


def ingest_energy_csv(spark, path: str) -> IngestResult:
    """Batch CSV -> document-shaped frames (entry point 1, SURVEY.md §3.1).

    Header row is handled by the CSV reader; all columns land as strings
    (the reference's DictReader semantics) and the transform owns casts.
    """
    raw = spark.read.option("header", True).csv(path)
    return validate_split(energy_transform(normalize_columns(raw)))
