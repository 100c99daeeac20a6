"""transformWithStateInPandas session tracker vs the batch sessionizer.

Drives the events table through the timer-based tracker
(streaming/session_tracker.py) with availableNow and checks every
emitted session bit-matches the x10 batch lag/cumsum sessionization;
sessions the final watermark cannot close (each user's tail session
within `gap` of the global max ts) are the only permitted absences.
"""

from __future__ import annotations

import importlib.util

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from tests.conftest import SF_ORACLE

GAP_S = 30 * 60

# transformWithStateInPandas' Python<->JVM state protocol is protobuf-based;
# this container has no protobuf and no pip (same gate as sklearn/PIL — the
# Spark-side plumbing is real, the end-to-end run needs the lib). The
# processor's LOGIC is covered unconditionally below via a fake handle.
_HAS_PROTOBUF = importlib.util.find_spec("google") is not None and (
    importlib.util.find_spec("google.protobuf") is not None
)


def _batch_sessions(ev):
    """x10-equivalent batch sessionization with the tracker's schema."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts = F.col("ts").cast("timestamp")
    gap_us = F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
    new_sess = F.when(
        gap_us.isNull() | (gap_us > GAP_S * 1_000_000), 1
    ).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
        ).alias("total_value"),
    )


@pytest.fixture(scope="module")
def tracked(spark, tmp_path_factory):
    if not _HAS_PROTOBUF:
        pytest.skip(
            "transformWithStateInPandas needs google.protobuf "
            "(not installed; container forbids pip)"
        )
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.session_tracker import (
        rocksdb_conf,
        track_sessions,
    )

    d = tmp_path_factory.mktemp("sess_src")
    ev = load_table(spark, SF_ORACLE, "events")
    ev.write.mode("overwrite").parquet(str(d / "events"))
    schema = spark.read.parquet(str(d / "events")).schema
    stream = spark.readStream.schema(schema).parquet(str(d / "events"))

    key, val = rocksdb_conf()
    prev = spark.conf.get(key, None)
    spark.conf.set(key, val)
    try:
        q = (
            track_sessions(stream, gap_seconds=GAP_S)
            .writeStream.format("memory")
            .queryName("sessions_out")
            .outputMode("append")
            .option("checkpointLocation", str(d / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = spark.sql("SELECT * FROM sessions_out").toPandas()
    return ev, got


def test_sessions_match_batch(spark, tracked):
    ev, got = tracked
    assert len(got) > 0, "no sessions emitted — timers never fired?"

    expected = _batch_sessions(ev).toPandas()
    max_ts = ev.select(
        F.max(F.col("ts").cast("timestamp")).alias("m")
    ).first()["m"]
    closeable = expected[
        expected["session_end"] + pd.Timedelta(seconds=GAP_S) <= max_ts
    ]

    key = ["user_id", "session_start"]
    got_s = got.sort_values(key, ignore_index=True)
    exp_s = closeable.sort_values(key, ignore_index=True)

    # every closeable batch session must be emitted, exactly once,
    # with identical boundaries and aggregates
    merged = exp_s.merge(got_s, on=key, suffixes=("_b", "_s"), how="left")
    assert merged["session_end_s"].notna().all(), "missing closed sessions"
    assert (merged["session_end_b"] == merged["session_end_s"]).all()
    assert (merged["n_events_b"] == merged["n_events_s"]).all()
    assert (
        (merged["total_value_b"] - merged["total_value_s"]).abs() < 1e-9
    ).all()
    # nothing extra: emitted sessions are a subset of batch sessions
    extra = got_s.merge(
        expected[key + ["n_events"]], on=key, how="left", suffixes=("", "_b")
    )
    assert extra["n_events_b"].notna().all(), "emitted session not in batch"
    # each emitted at most once
    assert not got_s.duplicated(subset=key).any()


def test_close_reasons(tracked):
    _, got = tracked
    # single availableNow batch: in-batch gaps close as 'gap'; the
    # final watermark advance closes the tail via 'timer' — both paths
    # must be exercised by the events table
    reasons = set(got["closed_by"])
    assert "gap" in reasons
    assert "timer" in reasons


# --- processor-logic tests with a fake handle (no protobuf needed) ---


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


class _FakeExpiredTimer:
    def __init__(self, ts_ms):
        self._ts = ts_ms

    def getExpiryTimeInMs(self):
        return self._ts


def _events(*rows):
    """rows: (ts_seconds, event_id, value)"""
    return pd.DataFrame(
        {
            "ts": pd.to_datetime([r[0] for r in rows], unit="s"),
            "event_id": [r[1] for r in rows],
            "value": [float(r[2]) for r in rows],
        }
    )


@pytest.fixture()
def tracker():
    from azure_serverless_etl_pipeline_spark.streaming.session_tracker import (
        SessionTracker,
    )

    t = SessionTracker(gap_seconds=60)
    handle = _FakeHandle()
    t.init(handle)
    return t, handle


def test_logic_gap_split_and_state(tracker):
    t, handle = tracker
    # events 10s apart, then a 100s gap -> first session closes as 'gap'
    out = list(
        t.handleInputRows(
            (7,), iter([_events((0, 1, 1.0), (10, 2, 2.0), (110, 3, 4.0))]), None
        )
    )
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["closed_by"] == "gap"
    assert row["n_events"] == 2 and row["total_value"] == 3.0
    assert row["session_end"] == pd.Timestamp(10, unit="s")
    # open session carried in state; timer re-registered at last+gap
    assert handle.state.exists()
    assert handle.timers == [110_000 + 60_000]


def test_logic_out_of_order_within_batch(tracker):
    t, _ = tracker
    # arrival order scrambled; same sessions as sorted order
    out = list(
        t.handleInputRows(
            (7,), iter([_events((110, 3, 4.0), (0, 1, 1.0), (10, 2, 2.0))]), None
        )
    )
    assert len(out) == 1 and out[0].iloc[0]["n_events"] == 2


def test_logic_timer_close_and_stale_timer(tracker):
    t, handle = tracker
    list(t.handleInputRows((7,), iter([_events((0, 1, 1.0))]), None))
    # stale timer (before last+gap) must NOT close the session
    assert list(t.handleExpiredTimer((7,), None, _FakeExpiredTimer(30_000))) == []
    assert handle.state.exists()
    # due timer closes and clears
    out = list(t.handleExpiredTimer((7,), None, _FakeExpiredTimer(60_000)))
    assert len(out) == 1 and out[0].iloc[0]["closed_by"] == "timer"
    assert not handle.state.exists()


def test_logic_state_spans_batches(tracker):
    t, _ = tracker
    assert list(t.handleInputRows((7,), iter([_events((0, 1, 1.0))]), None)) == []
    # second batch 30s later extends the same session (< gap)
    assert list(t.handleInputRows((7,), iter([_events((30, 2, 2.0))]), None)) == []
    out = list(t.handleExpiredTimer((7,), None, _FakeExpiredTimer(90_000)))
    row = out[0].iloc[0]
    assert row["n_events"] == 2 and row["total_value"] == 3.0
    assert row["session_start"] == pd.Timestamp(0, unit="s")
    assert row["session_end"] == pd.Timestamp(30, unit="s")


def test_logic_late_event_chains_into_open_session(tracker):
    t, handle = tracker
    # open session at t=1000..1010; a late event at 950 is within gap of
    # the start -> it CHAINS in (start widens, bounds stay correct)
    list(t.handleInputRows((7,), iter([_events((1000, 1, 1.0), (1010, 2, 1.0))]), None))
    out = list(t.handleInputRows((7,), iter([_events((950, 3, 5.0))]), None))
    assert out == []
    start_us, last_us, n, total = handle.state.get()
    assert start_us == 950_000_000 and last_us == 1010_000_000
    assert n == 3 and total == 7.0


def test_logic_late_event_beyond_gap_is_own_session(tracker):
    t, handle = tracker
    # open session at t=1000..1010 (gap 60s); late events at 100 and 130
    # predate start by >> gap -> they form their OWN past session,
    # emitted immediately with reason 'late'; the open session is
    # untouched (batch-twin semantics: two sessions, not one widened)
    list(t.handleInputRows((7,), iter([_events((1000, 1, 1.0), (1010, 2, 1.0))]), None))
    out = list(
        t.handleInputRows((7,), iter([_events((100, 3, 2.0), (130, 4, 3.0))]), None)
    )
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["closed_by"] == "late"
    assert row["n_events"] == 2 and row["total_value"] == 5.0
    assert row["session_start"] == pd.Timestamp(100, unit="s")
    assert row["session_end"] == pd.Timestamp(130, unit="s")
    start_us, last_us, n, total = handle.state.get()
    assert start_us == 1_000_000_000 and n == 2
