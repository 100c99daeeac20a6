"""SpaceSaving streaming top-k vs exact batch counts.

Drives the events table through streaming/topk_stream.py with
availableNow (two source files -> at least one real state carry-over)
and checks the SpaceSaving guarantees against exact batch counts:
bounds contain the truth, guaranteed items are truly top-k, and every
high-frequency item (> n/m) is present.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

M, K = 64, 10


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.topk_stream import (
        topk_stream,
    )

    d = tmp_path_factory.mktemp("topk_src")
    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_type", "user_id", "ts"
    )
    # two files -> the file source may batch them together or separately;
    # either way state must end up identical to one-pass merging
    ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(d / "src"))
    ev.filter(F.col("user_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(str(d / "src"))
    schema = spark.read.parquet(str(d / "src")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "src"))
    )
    q = (
        topk_stream(stream, m=M, k=K)
        .writeStream.format("memory")
        .queryName("topk_out")
        .outputMode("update")
        .option("checkpointLocation", str(d / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql(
        # update mode re-emits per batch: keep the final snapshot per
        # (event_type) = rows with the max n_seen
        """
        SELECT * FROM (
          SELECT *, max(n_seen) OVER (PARTITION BY event_type) AS max_seen
          FROM topk_out
        ) WHERE n_seen = max_seen
        """
    ).toPandas()
    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    return out, exact


def test_bounds_contain_truth(streamed):
    out, exact = streamed
    truth = exact.set_index(["event_type", "user_id"])["c"]
    assert len(out) > 0
    for _, r in out.iterrows():
        t = int(truth.get((r["event_type"], r["item"]), 0))
        assert r["lb"] <= t <= r["est"], (r["event_type"], r["item"], t, r["lb"], r["est"])


def test_n_seen_and_heavy_items(streamed):
    out, exact = streamed
    for et, grp in exact.groupby("event_type"):
        n = int(grp["c"].sum())
        sub = out[out["event_type"] == et]
        assert (sub["n_seen"] == n).all()
        # SpaceSaving: every item with count > n/m must be tracked; if it
        # is also in the true top-k by a margin, it must appear in output
        heavy = grp[grp["c"] > n / M].sort_values(
            ["c", "user_id"], ascending=[False, True]
        )
        top_out = set(sub["item"])
        for _, h in heavy.head(3).iterrows():  # clear heavy hitters
            if int(h["c"]) > int(heavy.iloc[min(K, len(heavy) - 1)]["c"]):
                assert int(h["user_id"]) in top_out


def test_guaranteed_items_truly_topk(streamed):
    out, exact = streamed
    for et, grp in exact.groupby("event_type"):
        true_topk = set(
            grp.sort_values(["c", "user_id"], ascending=[False, True])
            .head(K)["user_id"]
            .astype(int)
        )
        sub = out[(out["event_type"] == et) & out["guaranteed"]]
        # guaranteed -> lower bound beats (k+1)-th upper bound -> must be
        # in the true top-k (ties can only help)
        for item in sub["item"]:
            assert int(item) in true_topk


def test_state_survives_restart(spark, tmp_path):
    """Kill the query after batch 1, add a file, restart from the same
    checkpoint: the SpaceSaving state must carry over (n_seen covers
    ALL files; counts equal the one-pass result). Memory sink cannot
    resume, so results land in parquet via foreachBatch."""
    import pandas as pd
    from pyspark.sql import functions as F

    from azure_serverless_etl_pipeline_spark.sources import load_table
    from azure_serverless_etl_pipeline_spark.streaming.topk_stream import (
        topk_stream,
    )

    ev = load_table(spark, SF_ORACLE, "events").select("event_type", "user_id")
    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out))

    def run_once():
        schema = spark.read.parquet(str(src)).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            topk_stream(stream, m=M, k=K)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    ev.filter(F.col("user_id") % 3 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()  # first run: file 1 only
    ev.filter(F.col("user_id") % 3 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()  # restart from checkpoint: must NOT re-count file 1

    got = spark.read.parquet(str(out)).toPandas()
    final = got[got["n_seen"] == got.groupby("event_type")["n_seen"].transform("max")]
    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    truth = exact.set_index(["event_type", "user_id"])["c"]
    for et, grp in exact.groupby("event_type"):
        n = int(grp["c"].sum())
        sub = final[final["event_type"] == et]
        assert (sub["n_seen"] == n).all(), (et, sorted(set(sub["n_seen"])), n)
    for _, r in final.iterrows():
        t = int(truth.get((r["event_type"], r["item"]), 0))
        assert r["lb"] <= t <= r["est"]
