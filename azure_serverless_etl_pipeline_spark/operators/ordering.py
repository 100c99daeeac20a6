"""Training-order primitives (north-star extension).

``epoch_shuffle`` materializes a seed-reproducible global permutation
as (shard, pos) coordinates with NO global sort: a 32-way md5 hash
exchange plus independent per-shard sorts (readers stream shards
round-robin). ``length_batches`` is the padding-efficiency primitive:
length-bucketed, key-shuffled batches with pad-to-longest waste
accounting. Both keep every window partitioned (plan-gated against
SinglePartition in test_plan_quality) — the single implementation is
shared by the registered queries (x134/x135) and the scale-evidence
script so the benchmarked code IS the driver-checked code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    shards: int = 32,
) -> DataFrame:
    """(id, shard, pos): shard from the seeded md5 key, pos by
    intra-shard key order. Changing ``seed`` is the next epoch."""
    from pyspark.sql import Window as W

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % shards
    ).cast("int")
    w = W.partitionBy("shard").orderBy("key", id_col)
    return (
        df.select(id_col, key.alias("key"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def length_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    seed: int = 7,
    bucket_width: int = 256,
    max_bucket: int = 15,
    batch_size: int = 32,
) -> DataFrame:
    """Per (length_bucket, batch_id): size, max length, total length,
    and padding waste (docs * batch_max - total) — what a pad-to-longest
    collator burns. One scan + one per-bucket window + one group-all."""
    from pyspark.sql import Window as W

    bucket = F.least(
        F.floor(F.col(len_col) / F.lit(bucket_width)), F.lit(max_bucket)
    ).cast("int")
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    w = W.partitionBy("length_bucket").orderBy("key", id_col)
    staged = (
        df.select(
            id_col, len_col, bucket.alias("length_bucket"), key.alias("key")
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "batch_id", ((F.col("rn") - F.lit(1)) / F.lit(batch_size)).cast("int")
        )
    )
    return (
        staged.groupBy("length_bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max(len_col).alias("batch_max_chars"),
            F.sum(len_col).cast("long").alias("total_chars"),
        )
        .withColumn(
            "padding_waste",
            (
                F.col("n_docs") * F.col("batch_max_chars") - F.col("total_chars")
            ).cast("long"),
        )
    )
