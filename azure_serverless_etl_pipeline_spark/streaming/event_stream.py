"""Event-stream analytics: watermarked windows + custom stateful ops.

The reference's only streaming construct is the per-file blob trigger
(file_ingest.py covers it). A 100 TB event pipeline additionally needs
event-time aggregation with late-data policy and custom stateful
operators; both are expressed here on Structured Streaming and verified
against their batch equivalents (x11/x10) in tests — the
stream/batch-parity property Spark's unified model promises.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def ensure_event_time(df: DataFrame, *cols: str) -> DataFrame:
    """Cast event-time columns to TIMESTAMP (with-timezone) in place.

    Parquet timestamps may arrive as TIMESTAMP_NTZ (round-3 testdata
    regeneration), and Spark rejects NTZ columns for
    ``withWatermark``/``session_window``
    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]). The session runs UTC, so
    the cast is the identity on the stored instant — same guard as
    plans/queries.py x10 and operators/profile.py. Centralized here so
    every watermark site in this module shares one fix and a future
    testdata regeneration can't half-miss again. Columns already typed
    TIMESTAMP are left untouched (no-op cast is elided by Catalyst).
    """
    out = df
    for name in cols:
        field = next((f for f in df.schema.fields if f.name == name), None)
        if field is not None and isinstance(field.dataType, T.TimestampNTZType):
            out = out.withColumn(name, F.col(name).cast("timestamp"))
    return out


def hourly_windowed_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time aggregation with a late-data watermark.

    Works identically on a batch or streaming frame (unified API); in
    streaming, the watermark bounds state: windows older than
    max(event_time) - watermark are finalized and evicted. Output schema
    matches x11 (hour, event_type, n_events, total_value, n_users).
    """
    return (
        ensure_event_time(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "total_value"
            ),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
            "n_users_approx",
        )
    )


# --- custom stateful operator: running per-user spend with inactivity flush

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("running_total", T.DoubleType()),
    ]
)


def _running_spend(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """applyInPandasWithState body: accumulate (count, sum) per user and
    emit the updated running totals each micro-batch. State survives
    across batches; ProcessingTimeTimeout would flush idle users in a
    continuous deployment."""
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "events_seen": [n], "running_total": [round(total, 4)]}
    )


def running_user_spend(stream: DataFrame) -> DataFrame:
    """Custom stateful operator over a stream grouped by user.

    The Pandas-UDF-backed path for operators Spark's built-ins can't
    express (north-star requirement): arbitrary per-key state machines
    with Arrow-batched input.
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _running_spend,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str] | tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the stream form of x01 (dropDuplicates).

    dropDuplicatesWithinWatermark keeps per-key state only for the
    watermark horizon, so state is bounded by (arrival rate × horizon)
    instead of growing with the full key cardinality — the property that
    makes at-least-once sources (reference's blob trigger re-fires,
    SURVEY §2.9 T-3) safe to dedup at 100 TB. Duplicates arriving more
    than ``watermark`` apart are NOT collapsed (by design: bounded
    state); batch backfill dedup stays x01's dropDuplicates.
    """
    return (
        ensure_event_time(stream, "ts")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def attribution_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: purchases within ``horizon`` after
    each click (the streaming twin of batch query x35).

    Both sides are watermarked so Spark can bound join state: a buffered
    click is dropped once the purchase-side watermark passes click_ts +
    horizon, and vice versa — state is (rate × horizon), not unbounded.

    how="leftOuter" completes parity with x35's outer semantics:
    matched pairs emit as they join; a zero-purchase click emits its
    null-padded row only once the watermark passes click_ts + horizon
    (i.e. no purchase can still arrive) — Spark runs a no-data batch on
    watermark advance to flush these, so with availableNow the outer
    rows land for every click older than final_watermark - horizon;
    clicks younger than that stay buffered awaiting possible matches
    (deliberate: correctness over completeness on an open stream).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    c = ensure_event_time(
        clicks.select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        ),
        "click_ts",
    ).withWatermark("click_ts", watermark)
    b = ensure_event_time(
        purchases.select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("buy_ts"),
            F.col("value").alias("buy_value"),
        ),
        "buy_ts",
    ).withWatermark("buy_ts", watermark)
    return c.join(
        b,
        F.expr(
            f"user_id = b_user AND buy_ts > click_ts "
            f"AND buy_ts <= click_ts + INTERVAL {horizon}"
        ),
        how,
    ).select("click_id", "user_id", "click_ts", "buy_ts", "buy_value")


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows via the native session_window function —
    the streaming form of x10's batch sessionization (a session closes
    after ``gap`` of inactivity). Boundary caveat: the window end is
    EXCLUSIVE, so an event exactly ``gap`` after the previous one starts
    a NEW session, whereas x10's lag/cumsum splits only on gap > 30min.
    Works on batch and streaming frames; in streaming it needs a
    watermark on ts.
    """
    return (
        ensure_event_time(events, "ts")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | tuple[str, ...] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: look up dimension attributes for
    every streaming event (the per-event equivalent of the reference's
    point-read against Cosmos during request handling,
    data_analytics_api.py:68). Spark natively supports joining a stream
    against a static frame per micro-batch with no state store — the
    static side is re-read each batch, so a dimension updated between
    batches (e.g. by scd2_foreach_batch) is picked up automatically.

    ``broadcast_dim=True`` (default) hints the dimension broadcast —
    correct for genuinely small dims (the reference's device/home
    metadata class); pass False for large dimensions and let AQE decide
    per batch. Only inner/left joins are stream-static-supported on the
    stream side; this helper keeps the stream on the left.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    d = F.broadcast(dim) if broadcast_dim else dim
    keys = [on] if isinstance(on, str) else list(on)
    return stream.join(d, keys, how)


_FUNNEL_STATE = T.StructType(
    [
        T.StructField("step_reached", T.IntegerType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

_FUNNEL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("steps_reached", T.IntegerType()),
        T.StructField("funnel_complete", T.BooleanType()),
    ]
)


def _make_funnel(steps: list[str]):
    n_steps = len(steps)

    def _advance(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        """Per-user funnel state machine: (step_reached, ts of that step).
        Each micro-batch replays the user's new events in (ts, event_id)
        order and advances through the step list with the same
        first-qualifying-time rule as the batch operator
        (operators/funnel.funnel_times): step i+1 needs an event of that
        type STRICTLY after step i's time."""
        step, last_us = state.get if state.exists else (0, -1)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
        # robust to pandas returning datetime64[ns] or [us]
        ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        for et, t in zip(batch["event_type"], ts_us):
            if step >= n_steps:
                break
            if et == steps[step] and (step == 0 or t > last_us):
                step += 1
                last_us = int(t)
        state.update((int(step), int(last_us)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "steps_reached": [int(step)],
                "funnel_complete": [step >= n_steps],
            }
        )

    return _advance


def funnel_stream(stream: DataFrame, steps: list[str]) -> DataFrame:
    """Streaming event funnel — the applyInPandasWithState twin of
    operators/funnel (x93). State per user is two scalars (step index +
    its event time), so the store is O(|users|) regardless of event
    volume — the property that lets the funnel run continuously over an
    unbounded stream. Semantics match the batch operator when each
    user's events arrive time-ordered ACROSS micro-batches (within a
    batch, arbitrary order is fine — the batch is re-sorted); a late
    event that would have advanced an already-passed step is dropped,
    the standard streaming-funnel trade documented here rather than
    hidden. Emitted rows are per-user progress updates; aggregate
    per-step counts downstream (or in the sink) as they are monotone.
    """
    prepped = ensure_event_time(stream, "ts")
    return prepped.groupBy("user_id").applyInPandasWithState(
        _make_funnel(list(steps)),
        outputStructType=_FUNNEL_OUT,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
