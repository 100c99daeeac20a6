"""Event-driven file ingest: the blob-trigger analog (SURVEY.md §2.9).

The reference fires an Azure Function per uploaded blob (at-least-once,
``blobToCosmos.py:28``) and relies on upsert for idempotence. The
Structured Streaming file source upgrades this to exactly-once per file:
the checkpoint records processed files, so re-runs never double-ingest
(T-1/T-3), and ``Trigger.AvailableNow`` gives batch parity — one call
drains everything currently in the landing dir, then stops (T-2).

The valid/quarantine split (T-4) runs inside ``foreachBatch`` so both
sinks commit per micro-batch; counters come from the batch counts (the
reference's transformed/inserted/skipped tallies).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.ingest import energy_transform, normalize_header, validate_split

# Landing schema: streaming sources need an explicit schema (no inference
# race with arriving files). All strings — the transform owns casts,
# mirroring csv.DictReader semantics (blobToCosmos.py:36).
RAW_HEADERS = [
    "Home ID",
    "Appliance Type",
    "Energy Consumption (kWh)",
    "Time",
    "Date",
    "Outdoor Temperature (°C)",
    "Season",
    "Household Size",
]


def landing_schema(headers: list[str] | None = None) -> T.StructType:
    return T.StructType(
        [T.StructField(h, T.StringType(), True) for h in (headers or RAW_HEADERS)]
    )


@dataclass
class IngestCounters:
    """Per-batch tallies, reference blobToCosmos.py:80-81."""

    transformed: int = 0
    inserted: int = 0
    skipped: int = 0
    batches: list[int] = field(default_factory=list)


def start_energy_file_ingest(
    spark: SparkSession,
    landing_dir: str,
    valid_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    headers: list[str] | None = None,
    partition_by: tuple[str, ...] = ("HomeID",),
    counters: IngestCounters | None = None,
):
    """Start the ingest stream; returns the StreamingQuery.

    Uses availableNow so a call processes the current landing-dir
    contents then stops — the batch-parity mode. A production deployment
    drops availableNow for continuous tailing; nothing else changes.
    """
    raw = (
        spark.readStream.schema(landing_schema(headers))
        .option("header", True)
        .option("maxFilesPerTrigger", 16)
        .csv(landing_dir)
    )
    normalized = raw.toDF(*[normalize_header(c) for c in raw.columns])
    transformed = energy_transform(normalized)

    def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # foreachBatch: both sinks commit within one micro-batch; the
        # split is computed once (cache) to avoid a double scan
        batch_df.persist()
        try:
            split = validate_split(batch_df)
            n_valid = split.valid.count()
            n_quar = split.quarantine.count()
            split.valid.write.mode("append").partitionBy(*partition_by).parquet(
                valid_dir
            )
            if n_quar:
                split.quarantine.write.mode("append").parquet(quarantine_dir)
            if counters is not None:
                counters.transformed += n_valid + n_quar
                counters.inserted += n_valid
                counters.skipped += n_quar
                counters.batches.append(epoch_id)
        finally:
            batch_df.unpersist()

    return (
        transformed.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
