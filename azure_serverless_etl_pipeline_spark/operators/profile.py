"""Table profiling (data-quality summary) — one scan, one aggregate.

A pipeline that ingests 100 TB needs a cheap answer to "what does this
table look like": row count, per-column null counts, distinct
cardinalities, and value ranges. ``profile_table`` computes every metric
for every column in a SINGLE aggregate pass (Catalyst evaluates the
~6·n_cols aggregate expressions in one partial+final hash aggregate over
one scan), then unpivots with ``stack`` to one row per column — no join,
no second scan, output is |columns| rows.

Numeric columns report min/max values; timestamps report epoch
microseconds (as double — engine-stable); strings report min/max LENGTH
(value min/max of strings would hit engine-specific collation and float
formatting). ``n_distinct`` is HLL approx_count_distinct by DEFAULT:
exact multi-column COUNT(DISTINCT) compiles to an Expand that multiplies
the scan |columns|x (the one plan in this repo that flatly dies at 100
TB — 11 distinct columns means 11 copies of every lineitem row through
the shuffle). Pass ``approx_distinct=False`` only when exact
cardinalities are worth that cost (e.g. the x71 oracle-parity twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _range_cols(field: T.StructField) -> tuple[Column, Column]:
    c = F.col(field.name)
    if isinstance(field.dataType, (T.NumericType,)):
        return F.min(c).cast("double"), F.max(c).cast("double")
    if isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
        # NTZ has no unix_micros; the session runs UTC so the cast is the
        # identity mapping and epoch-us matches DuckDB's epoch_us
        us = F.unix_micros(c.cast("timestamp"))
        return F.min(us).cast("double"), F.max(us).cast("double")
    if isinstance(field.dataType, T.StringType):
        ln = F.length(c)
        return F.min(ln).cast("double"), F.max(ln).cast("double")
    return F.lit(None).cast("double"), F.lit(None).cast("double")


def profile_table(df: DataFrame, approx_distinct: bool = True) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_val, max_val). Single scan, single aggregate, no join."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for f in df.schema.fields:
        c = F.col(f.name)
        nd = (
            F.approx_count_distinct(c) if approx_distinct else F.count_distinct(c)
        )
        mn, mx = _range_cols(f)
        aggs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"__nulls_{f.name}"),
            nd.alias(f"__nd_{f.name}"),
            mn.alias(f"__min_{f.name}"),
            mx.alias(f"__max_{f.name}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{f.name}', __rows, __nulls_{f.name}, __nd_{f.name}, "
        f"__min_{f.name}, __max_{f.name}"
        for f in df.schema.fields
    )
    n = len(df.schema.fields)
    return one.selectExpr(
        f"stack({n}, {stack_args}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_val, max_val)"
    )


def content_checksum(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Order-independent per-group content checksum: (group, n_rows,
    checksum) where checksum = SUM of a 60-bit md5 fold of
    ``id:content`` per row, summed as DECIMAL(38,0).

    The copy/migration integrity primitive at 100 TB: source and
    destination each compute their checksum table independently (one
    scan, one aggregate, no sort, no co-location) and a KB-scale join
    compares them. Addition is commutative, so the result is identical
    under any partitioning/ordering — and decimal addition keeps it
    bit-exact cross-engine (the DuckDB oracle folds the same 15 hex
    chars). 60 bits per row keeps the sum far inside DECIMAL(38)
    (overflow needs ~2^66 rows)."""
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        F.col(content_col),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("decimal(38,0)")
    )
    # Emitted as STRING: a DECIMAL(38,0) exceeds int64, and pandas/Arrow
    # bridges coerce big decimals to lossy float64 on some engines — the
    # digit string is the only representation that survives every hop.
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(fold).cast("decimal(38,0)").cast("string").alias("checksum"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Corpus-version diff: per-status (added / removed / changed /
    unchanged) row counts between two snapshots — the other half of the
    migration-validation story next to ``content_checksum`` (the
    checksum says WHETHER two copies diverge; the diff says HOW).

    Each side is reduced to (id, md5(content)) before the join, so the
    shuffle carries 32-byte digests instead of documents — at 100 TB the
    exchange is O(rows * 48 B), and the full-outer hash join on the id
    is the only stage. Output is 4 bounded rows."""
    # Presence is keyed on an explicit marker, NOT hash nullity: a row
    # whose content is NULL hashes to NULL, and deciding added/removed
    # from the hash would misclassify it (and diverge from the oracle,
    # which tests id presence). coalesce(md5, '<null>') keeps NULL vs
    # NULL comparing as unchanged and NULL vs non-NULL as changed.
    oh = old.select(
        F.col(id_col).alias("_id"),
        F.lit(True).alias("_in_old"),
        F.coalesce(F.md5(F.col(content_col)), F.lit("<null>")).alias("_oh"),
    )
    nh = new.select(
        F.col(id_col).alias("_id"),
        F.lit(True).alias("_in_new"),
        F.coalesce(F.md5(F.col(content_col)), F.lit("<null>")).alias("_nh"),
    )
    j = oh.join(nh, "_id", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(F.col("_oh") == F.col("_nh"), "unchanged")
        .otherwise("changed")
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def merge_checksum_tables(*tables: DataFrame) -> DataFrame:
    """Merge per-shard/per-micro-batch checksum tables into the corpus
    checksum: union + groupBy + decimal sum (re-emitted as the digit
    string). ``content_checksum`` is a sum, so it is ALGEBRAIC — a
    stream can maintain it per micro-batch and fold, a 1000-executor
    job can checksum per shard and merge, and the result is identical
    to the one-shot aggregate (pytest-pinned against batch truth)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), tables)
    return (
        u.groupBy(*[c for c in u.columns if c not in ("n_rows", "checksum")])
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum(F.col("checksum").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("checksum"),
        )
    )
