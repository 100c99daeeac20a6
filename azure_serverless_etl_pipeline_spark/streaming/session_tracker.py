"""Timer-driven session tracking on transformWithStateInPandas.

The reference's streaming surface is the per-file blob trigger
(file_ingest.py); its analytics layer sessionizes in batch
(SURVEY §2 W-family; batch twin: plans/queries.py x10). This module adds
the continuous form on Spark 4's arbitrary-stateful API
(``transformWithStateInPandas``): per-user session state plus an
EVENT-TIME TIMER that closes a session once the watermark passes
``last_event + gap`` — the piece ``applyInPandasWithState`` (see
event_stream.running_user_spend) cannot express, because that older API
only reacts to input rows or processing-time timeouts, never to
event-time progress.

Semantics (vs the batch lag/cumsum sessionizer, x10):
- Events inside one micro-batch are re-sorted per user, so arbitrary
  intra-batch order is fine.
- A session CLOSES either (a) when a later in-order event for the same
  user arrives more than ``gap`` after the session's last event — the
  closed session is emitted immediately — or (b) when the event-time
  timer fires (watermark ≥ last_event + gap) with no such event.
- A late event that lands in an already-closed session's span starts a
  new session instead of reopening the old one (bounded state: the
  standard streaming-sessionization trade, same as
  dropDuplicatesWithinWatermark's horizon trade, and documented rather
  than hidden). With availableNow over a single batch the semantics
  coincide exactly with x10 for every session the final watermark can
  close; the parity test asserts that.

Requires the RocksDB state-store provider (Spark's requirement for
transformWithState); ``rocksdb_conf()`` returns the one conf to set.
Environment gate: the Python<->JVM state protocol is protobuf-based, so
an end-to-end run needs ``google.protobuf`` (absent in this container,
which forbids pip — same gate as sklearn/PIL elsewhere). The processor
logic is engine-independent and unit-tested against a fake handle; the
stream/batch parity test auto-skips when protobuf is missing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .event_stream import ensure_event_time

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed_by", T.StringType()),  # 'gap' | 'timer'
    ]
)


def rocksdb_conf() -> tuple[str, str]:
    """The session conf transformWithState requires (set before .start())."""
    return (
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )


def _emit(user_id: int, start_us: int, last_us: int, n: int, total: float,
          closed_by: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "closed_by": [closed_by],
        }
    )


class SessionTracker(StatefulProcessor):
    """Per-user gap sessionizer: value state (4 scalars) + one live
    event-time timer per user. State is O(|active users|); every closed
    session is emitted exactly once (append mode)."""

    def __init__(self, gap_seconds: int = 30 * 60):
        self._gap_us = int(gap_seconds) * 1_000_000
        self._gap_ms = int(gap_seconds) * 1_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("session", _STATE_SCHEMA)

    def _retime(self, last_us: int) -> None:
        """Move the user's single close-timer to last_event + gap."""
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(last_us // 1000 + self._gap_ms)

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
        ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        values = batch["value"].to_numpy()

        if self._state.exists():
            start_us, last_us, n, total = self._state.get()
        else:
            start_us = None

        out: list[pd.DataFrame] = []
        # Late-event handling (nonzero watermark): an event older than the
        # open session's start either CHAINS into it (start - gap <= t <
        # start: widen the session so start/n_events bound the members) or
        # predates it by more than the gap — a separate PAST session. The
        # latter run through their own gap accumulator and emit
        # immediately (reason "late"), matching the batch sessionizer
        # except that late sessions cannot merge ACROSS micro-batches
        # (the state tracks one open session; watermark-delayed arrivals
        # of the same past session in different batches emit separately —
        # the documented at-risk corner of any bounded-state tracker).
        late = None  # (start, last, n, total)
        for t, v in zip(ts_us, values):
            t = int(t)
            if start_us is not None and t < start_us - self._gap_us:
                if late is None:
                    late = [t, t, 1, float(v)]
                elif t - late[1] > self._gap_us:
                    out.append(_emit(user_id, *late, "late"))
                    late = [t, t, 1, float(v)]
                else:
                    late[1] = max(late[1], t)
                    late[2] += 1
                    late[3] += float(v)
                continue
            if start_us is None:
                start_us, last_us, n, total = t, t, 1, float(v)
            elif t - last_us > self._gap_us:
                out.append(_emit(user_id, start_us, last_us, n, total, "gap"))
                start_us, last_us, n, total = t, t, 1, float(v)
            else:
                start_us = min(start_us, t)
                last_us = max(last_us, t)
                n += 1
                total += float(v)
        if late is not None:
            out.append(_emit(user_id, *late, "late"))
        if start_us is not None:
            self._state.update((start_us, last_us, int(n), float(total)))
            self._retime(last_us)
        return iter(out)

    def handleExpiredTimer(
        self,
        key: tuple,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        if not self._state.exists():
            return iter([])
        start_us, last_us, n, total = self._state.get()
        # A stale timer (re-timed after this one was queued) must not
        # close a still-live session.
        if expiredTimerInfo.getExpiryTimeInMs() < last_us // 1000 + self._gap_ms:
            return iter([])
        self._state.clear()
        return iter([_emit(key[0], start_us, last_us, int(n), float(total),
                           "timer")])

    def close(self) -> None:
        pass


def track_sessions(
    stream: DataFrame,
    gap_seconds: int = 30 * 60,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Continuous sessionization of an event stream (streaming twin of
    x10, built on the timer API rather than session_window so the
    close-policy is explicit and extensible — e.g. emitting partial
    session heartbeats would be one more ``out.append``).

    Returns an append-mode stream of CLOSED sessions
    (user_id, session_start, session_end, n_events, total_value,
    closed_by). Set the RocksDB provider conf (``rocksdb_conf()``)
    before starting the query.
    """
    prepped = ensure_event_time(stream, "ts").select(
        "user_id", "ts", "event_id", "value"
    )
    return (
        prepped.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionTracker(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="EventTime",
        )
    )
