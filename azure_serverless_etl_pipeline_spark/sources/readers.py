"""Batch readers (reference scan surface S-1..S-3).

The reference's three scan paths — pandas read_csv with inference
(``process_etl.py:5``), csv.DictReader over blob bytes
(``blobToCosmos.py:34-36``), and whole-file JSON arrays
(``blob_to_cosmosdb.py:29``) — map to Spark's csv/json sources. Explicit
schemas are the default (inference costs an extra pass and is
non-deterministic across files); inference is kept only as the S-1
compatibility path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_inferred(spark: SparkSession, path: str) -> DataFrame:
    """S-1: pandas read_csv analog — header + dtype inference.

    Inference scans the data twice; fine for exploration, not for
    production ingest (use read_csv below with a schema).
    """
    return spark.read.option("header", True).option("inferSchema", True).csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    all_strings: bool = False,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """S-2: DictReader analog — header row, explicit schema, permissive
    parse (malformed fields -> NULL, matching the reference's
    cast-failure semantics downstream)."""
    reader = spark.read.option("header", True).option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    elif all_strings:
        # emulate DictReader: everything lands as a string; the transform
        # owns casts (blobToCosmos.py:62-70)
        header = spark.read.option("header", True).csv(path).columns
        reader = reader.schema(
            T.StructType([T.StructField(c, T.StringType(), True) for c in header])
        )
    return reader.csv(path)


def read_json_records(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    multi_line: bool = True,
) -> DataFrame:
    """S-3: whole-file JSON array of records (multiLine); line-delimited
    JSON when multi_line=False."""
    reader = spark.read.option("multiLine", multi_line)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text_lines(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw-text corpus reader (north-star extension, no reference analog).

    Line mode: one row per line, column ``value`` — the shape a 100 TB
    crawl dump arrives in (one document per line after WET extraction);
    splittable, so parallelism follows file blocks. Whole-file mode
    (wholetext): one row per FILE — required when documents contain
    newlines; NOT splittable (one task per file), so at scale the input
    must be many small-to-medium files, never one giant file.
    """
    return spark.read.text(path, wholetext=whole_file)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as parquet
    (predicate pushdown + column pruning verified in test_readers); the
    interchange format when upstream warehouses emit ORC."""
    return spark.read.orc(path)
