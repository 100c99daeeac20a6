"""Semantics tests for round-5 operators: span-level substring dedup
(planted boilerplate vanishes from every copy, unique prose survives)
and sequential-Poisson weighted sampling (weight actually biases
inclusion). Cross-engine exactness is covered by the x126/x127/x128
oracle-parity rows in test_queries_oracle."""

from __future__ import annotations

import pytest


def test_substring_span_dedup_removes_shared_span_only(spark):
    from azure_serverless_etl_pipeline_spark.operators.dedup import (
        substring_span_dedup,
    )

    boiler = "all rights reserved contact us at example dot com"  # 9 tokens
    rows = [
        (1, f"alpha beta gamma {boiler} delta"),
        (2, f"{boiler} epsilon zeta"),
        (3, "totally unique document with no shared spans at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in substring_span_dedup(df, n=8, min_df=2).collect()
    }
    assert "rights reserved" not in out[1].clean_text
    assert "rights reserved" not in out[2].clean_text
    # unique prose survives verbatim
    assert out[1].clean_text.startswith("alpha beta gamma")
    assert out[1].clean_text.endswith("delta")
    assert out[3].clean_text == rows[2][1]
    assert out[3].n_removed == 0
    assert out[1].n_removed == 9 and out[2].n_removed == 9


def test_substring_span_dedup_short_docs_pass_through(spark):
    from azure_serverless_etl_pipeline_spark.operators.dedup import (
        substring_span_dedup,
    )

    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id long, text string"
    )
    out = substring_span_dedup(df, n=8, min_df=2).collect()
    assert all(r.n_removed == 0 and r.clean_text == "too short" for r in out)


def test_weighted_sample_biases_toward_weight(spark):
    from pyspark.sql import functions as F

    from azure_serverless_etl_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    # 2000 rows: half weight 1, half weight 50 — the heavy half must
    # dominate the winners (sequential Poisson: P(include) ~ prop. to w)
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 50).otherwise(1).alias("w"),
    )
    won = weighted_sample(df, weight_col="w", k=100, id_col="doc_id").collect()
    assert len(won) == 100
    heavy = sum(1 for r in won if r.w == 50)
    assert heavy >= 85, f"heavy rows won only {heavy}/100"


def test_weighted_sample_is_stable_under_repartition(spark):
    from pyspark.sql import functions as F

    from azure_serverless_etl_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    a = {r.doc_id for r in weighted_sample(df, "w", 50).collect()}
    b = {
        r.doc_id
        for r in weighted_sample(df.repartition(13), "w", 50).collect()
    }
    assert a == b  # no RNG/partition state — identical winners


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from pyspark.sql import functions as F

    from azure_serverless_etl_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 50, 0).otherwise(10).alias("w"),
    )
    won = weighted_sample(df, weight_col="w", k=50, id_col="doc_id").collect()
    # exactly the 50 positive-weight rows win; zero-weight rows (priority
    # pinned to +Inf, mirroring the oracle) never enter the sample
    assert len(won) == 50
    assert all(r.w == 10 for r in won)


def test_weighted_sample_invariant_under_weight_scaling(spark):
    from pyspark.sql import functions as F

    from azure_serverless_etl_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 9 + 1).alias("w")
    )
    scaled = df.withColumn("w", F.col("w") * 1000)
    a = {r.doc_id for r in weighted_sample(df, "w", 40).collect()}
    b = {r.doc_id for r in weighted_sample(scaled, "w", 40).collect()}
    # priorities scale uniformly, ordering is invariant: pps inclusion
    # depends on relative weights only
    assert a == b
