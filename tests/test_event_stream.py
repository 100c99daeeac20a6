"""Stream/batch parity for event-time analytics, and the custom stateful
operator. Streams are driven from the events parquet (re-written as a
streaming source dir) with availableNow + memory sink."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def event_source(spark, tmp_path_factory):
    """events table materialized as a streaming-readable dir with a
    microsecond ts column (streaming needs an explicit schema)."""
    from azure_serverless_etl_pipeline_spark.sources import load_table

    d = tmp_path_factory.mktemp("stream_src")
    ev = load_table(spark, SF_ORACLE, "events")
    ev.write.mode("overwrite").parquet(str(d / "events"))
    schema = spark.read.parquet(str(d / "events")).schema
    return str(d / "events"), schema, ev


def test_ensure_event_time_ntz_guard(spark, event_source):
    """Regression for the round-3 breakage: testdata regeneration turned
    events.ts into TIMESTAMP_NTZ, which Spark rejects for watermarks
    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]). Every watermark site must go
    through ensure_event_time, and the helper must (a) rewrite NTZ to
    TIMESTAMP, (b) leave TIMESTAMP untouched, (c) ignore absent columns."""
    from pyspark.sql import types as T

    from azure_serverless_etl_pipeline_spark.streaming.event_stream import (
        ensure_event_time,
    )

    _, _, ev = event_source
    ntz = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    fixed = ensure_event_time(ntz, "ts")
    assert isinstance(fixed.schema["ts"].dataType, T.TimestampType)
    # identity on the stored instant (session is UTC)
    a = ntz.select(F.max("ts").cast("timestamp").alias("m")).first()["m"]
    b = fixed.select(F.max("ts").alias("m")).first()["m"]
    assert a == b
    # already-TIMESTAMP and missing columns are no-ops, not errors
    again = ensure_event_time(fixed, "ts", "no_such_col")
    assert isinstance(again.schema["ts"].dataType, T.TimestampType)


def test_windowed_agg_stream_matches_batch(spark, event_source, tmp_path):
    from azure_serverless_etl_pipeline_spark.streaming.event_stream import (
        hourly_windowed_agg,
    )

    path, schema, ev = event_source
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        hourly_windowed_agg(stream)
        .writeStream.format("memory")
        .queryName("hourly_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hourly_out").toPandas()

    expected = hourly_windowed_agg(ev).toPandas()  # same fn, batch frame
    key = ["hour", "event_type"]
    got = got.sort_values(key, ignore_index=True)
    expected = expected.sort_values(key, ignore_index=True)

    # append mode emits only windows finalized by the watermark; with
    # availableNow the final watermark is max(ts) - 2h, so the last
    # window(s) may be withheld — everything emitted must match batch.
    assert len(got) >= len(expected) - 4
    merged = got.merge(expected, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["total_value_s"] == merged["total_value_b"]).all()


def test_running_user_spend_state(spark, event_source, tmp_path):
    from azure_serverless_etl_pipeline_spark.streaming.event_stream import (
        running_user_spend,
    )

    path, schema, ev = event_source
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        running_user_spend(stream)
        .writeStream.format("memory")
        .queryName("spend_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, max_by(events_seen, events_seen) AS events_seen, "
        "max_by(running_total, events_seen) AS running_total "
        "FROM spend_out GROUP BY user_id"
    ).toPandas()

    expected = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.round(F.sum("value"), 4).alias("running_total"),
        )
        .toPandas()
    )
    key = "user_id"
    got = got.sort_values(key, ignore_index=True)
    expected = expected.sort_values(key, ignore_index=True)
    assert (got["events_seen"].to_numpy() == expected["events_seen"].to_numpy()).all()
    assert (
        abs(got["running_total"].to_numpy() - expected["running_total"].to_numpy())
        < 1e-6
    ).all()


def test_session_window_matches_lag_sessionize(spark, event_source):
    """Native session_window == the lag/cumsum sessionization (x10) on the
    same data: same session count per user, same event totals."""
    from azure_serverless_etl_pipeline_spark.plans import all_queries
    from azure_serverless_etl_pipeline_spark.streaming.event_stream import (
        session_window_agg,
    )

    _, _, ev = event_source
    native = session_window_agg(ev).toPandas()
    lagged = all_queries()["x10_sessionize"](spark, SF_ORACLE).toPandas()

    n_native = native.groupby("user_id").size().sort_index()
    n_lagged = lagged.groupby("user_id").size().sort_index()
    assert (n_native == n_lagged).all()
    assert native["n_events"].sum() == lagged["n_events"].sum()
    # session_window's end = last event + gap; starts must match exactly
    a = native.sort_values(["user_id", "session_start"], ignore_index=True)
    b = lagged.sort_values(["user_id", "session_start"], ignore_index=True)
    assert (a["session_start"].to_numpy() == b["session_start"].to_numpy()).all()
    assert (abs(a["total_value"] - b["total_value"]) < 1e-9).all()


def test_session_window_streaming(spark, event_source, tmp_path):
    from azure_serverless_etl_pipeline_spark.streaming.event_stream import (
        ensure_event_time,
        session_window_agg,
    )
    from pyspark.sql import functions as F

    path, schema, ev = event_source
    stream = ensure_event_time(
        spark.readStream.schema(schema).parquet(path), "ts"
    ).withWatermark("ts", "2 hours")
    q = (
        session_window_agg(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_out").toPandas()
    batch = session_window_agg(ev).toPandas()
    # append emits watermark-finalized sessions; all must match batch rows
    assert len(got) >= len(batch) - len(batch["user_id"].unique())
    merged = got.merge(
        batch, on=["user_id", "session_start"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()


def test_dedup_stream_within_watermark(spark, event_source, tmp_path):
    """A re-delivered file (at-least-once source, SURVEY §2.9 T-3) must
    not produce duplicate events downstream."""
    from azure_serverless_etl_pipeline_spark.streaming.event_stream import (
        dedup_stream,
    )

    path, schema, ev = event_source
    # stage the same events twice = every row re-delivered once
    src = tmp_path / "dup_src"
    sample = ev.limit(2000)
    sample.write.mode("overwrite").parquet(str(src / "a"))
    sample.write.mode("append").parquet(str(src / "a"))
    stream = spark.readStream.schema(schema).parquet(str(src / "a"))
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_out").toPandas()
    n_distinct = sample.select("event_id").distinct().count()
    assert len(got) == n_distinct
    assert got["event_id"].is_unique


def test_attribution_stream_matches_batch(spark, event_source, tmp_path):
    """Stream-stream interval join emits exactly the matched pairs the
    batch range join (x35) finds."""
    from azure_serverless_etl_pipeline_spark.streaming.event_stream import (
        attribution_stream,
    )

    path, schema, ev = event_source
    stream = spark.readStream.schema(schema).parquet(path)
    clicks_s = stream.filter(F.col("event_type") == "click")
    buys_s = stream.filter(F.col("event_type") == "purchase")
    q = (
        attribution_stream(clicks_s, buys_s)
        .writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM attr_out").toPandas()

    batch = attribution_stream(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    ).toPandas()
    key = ["click_id", "buy_ts"]
    got = got.sort_values(key, ignore_index=True)
    batch = batch.sort_values(key, ignore_index=True)
    assert len(got) == len(batch)
    assert (got["click_id"].to_numpy() == batch["click_id"].to_numpy()).all()
    assert (got["buy_value"].to_numpy() == batch["buy_value"].to_numpy()).all()

    # pair count agrees with the batch oracle query x35's n_purchases sum
    from azure_serverless_etl_pipeline_spark.plans import all_queries

    x35 = all_queries()["x35_attribution_join"](spark, SF_ORACLE).toPandas()
    assert int(x35["n_purchases"].sum()) == len(batch)


def test_attribution_stream_left_outer(spark, event_source, tmp_path):
    """Watermarked left-outer stream-stream join: matched pairs equal the
    inner join's; zero-purchase clicks emit null-padded rows once the
    watermark passes click_ts + horizon (parity with batch x35's outer
    semantics)."""
    import pandas as pd

    from azure_serverless_etl_pipeline_spark.plans import all_queries
    from azure_serverless_etl_pipeline_spark.streaming.event_stream import (
        attribution_stream,
    )

    path, schema, ev = event_source
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        attribution_stream(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "purchase"),
            how="leftOuter",
        )
        .writeStream.format("memory")
        .queryName("attr_outer_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_attr_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM attr_outer_out").toPandas()

    # matched rows must be exactly the inner join's result
    inner = attribution_stream(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    ).toPandas()
    matched = got[got["buy_ts"].notna()]
    key = ["click_id", "buy_ts"]
    assert len(matched) == len(inner)
    assert (
        matched.sort_values(key, ignore_index=True)["click_id"].to_numpy()
        == inner.sort_values(key, ignore_index=True)["click_id"].to_numpy()
    ).all()

    # null rows: exactly the zero-purchase clicks from batch x35, up to the
    # watermark horizon (clicks too recent for the final watermark stay
    # buffered by design)
    x35 = all_queries()["x35_attribution_join"](spark, SF_ORACLE).toPandas()
    zero = x35[x35["n_purchases"] == 0]
    nulls = got[got["buy_ts"].isna()]
    assert set(nulls["click_id"]) <= set(zero["click_id"])
    # completeness below the emission frontier: final watermark = min side
    # max ts - 2h; a zero-purchase click older than frontier - horizon MUST
    # have been flushed
    maxes = (
        ev.groupBy("event_type").agg(F.max("ts").alias("m")).toPandas()
        .set_index("event_type")["m"]
    )
    frontier = (
        min(maxes["click"], maxes["purchase"])
        - pd.Timedelta(hours=2)   # watermark
        - pd.Timedelta(hours=1)   # horizon
        - pd.Timedelta(minutes=5) # slack
    )
    must_emit = zero[zero["click_ts"] < frontier]
    assert set(must_emit["click_id"]) <= set(nulls["click_id"])
    assert len(must_emit) > 0  # the assertion above must not be vacuous


def test_enrich_stream_matches_batch_join(spark, event_source, tmp_path):
    """Stream-static enrichment: joining the event stream against a small
    user-dimension frame must yield exactly the batch join's rows, and
    unmatched events survive a left enrich with NULL attributes."""
    from azure_serverless_etl_pipeline_spark.streaming.event_stream import (
        enrich_stream,
    )

    path, schema, ev = event_source
    dim = (
        ev.select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)  # half the users have metadata
        .withColumn("tier", F.when(F.col("user_id") % 4 == 0, "gold")
                    .otherwise("silver"))
    )
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        enrich_stream(stream, dim, on="user_id", how="left")
        .writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM enrich_out").toPandas()
    want = ev.join(F.broadcast(dim), "user_id", "left").toPandas()
    assert len(got) == len(want) == ev.count()  # left: no event lost
    key = ["event_id"]
    g = got.sort_values(key, ignore_index=True)
    w = want.sort_values(key, ignore_index=True)
    assert g["tier"].isna().sum() == w["tier"].isna().sum() > 0
    assert (g["tier"].fillna("-") == w["tier"].fillna("-")).all()


def test_funnel_stream_matches_batch(spark, event_source, tmp_path):
    """Streaming funnel (applyInPandasWithState) vs the batch operator on
    the same events: per-user steps_reached must agree (events are
    delivered in one availableNow pass, so the in-order assumption
    holds), and the per-step reached counts must reproduce x93."""
    from azure_serverless_etl_pipeline_spark.operators.funnel import funnel_times
    from azure_serverless_etl_pipeline_spark.streaming.event_stream import (
        funnel_stream,
    )

    path, schema, ev = event_source
    steps = ["signup", "click", "purchase"]
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        funnel_stream(stream, steps)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, max(steps_reached) AS steps_reached FROM funnel_out GROUP BY user_id"
    ).toPandas()

    bt = funnel_times(ev, steps).toPandas()
    want = {}
    for _, r in bt.iterrows():
        n = 0
        for i in range(1, len(steps) + 1):
            if pd.notna(r[f"t{i}"]):
                n = i
        want[r["user_id"]] = n
    got_map = dict(zip(got["user_id"], got["steps_reached"]))
    # users with zero signups never enter the batch frame but DO get a
    # streaming state row with steps_reached=0
    for u, n in want.items():
        assert got_map.get(u, 0) == n, (u, got_map.get(u), n)
    for u, n in got_map.items():
        if u not in want:
            assert n == 0
