"""Decontamination, repetition-suite, and hashed-classifier behavior tests
(the cross-engine value checks live in test_queries_oracle via
x84/x85/x86; these pin the operator semantics directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_serverless_etl_pipeline_spark.operators import decontam
from azure_serverless_etl_pipeline_spark.operators.text import (
    hashed_classifier_score,
    repetition_stats,
)
from azure_serverless_etl_pipeline_spark.sources.catalog import load_table

from tests.conftest import SF_ORACLE


def _docs(spark):
    return load_table(spark, SF_ORACLE, "documents")


def test_decontaminate_removes_every_overlapping_doc(spark):
    docs = _docs(spark)
    eval_df = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    clean = decontam.decontaminate(corpus, eval_df, n=5)
    # The cleaned corpus shares ZERO 5-grams with the eval set.
    assert decontam.contamination_report(clean, eval_df, n=5).count() == 0
    # Flagged + clean partitions the corpus exactly.
    n_flagged = decontam.contamination_report(corpus, eval_df, n=5).count()
    assert clean.count() + n_flagged == corpus.count()
    assert n_flagged > 0  # testdata plants exact dups across the split


def test_decontaminate_keeps_schema(spark):
    docs = _docs(spark)
    eval_df = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    assert decontam.decontaminate(corpus, eval_df, n=5).schema == corpus.schema


def test_repetition_stats_on_planted_docs(spark):
    rows = [
        (1, "a b a b a b"),        # bigrams: [a b, b a, a b, b a, a b]
        (2, "x y z w v u t s q"),  # all distinct
        (3, "solo"),               # no bigrams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["top_bigram"] == "a b" and got[1]["top_bigram_count"] == 3
    assert got[1]["n_bigrams"] == 5
    assert abs(got[1]["top_bigram_frac"] - 0.6) < 1e-9
    # 5-grams of doc1: [ababa, babab] -> none repeated
    assert got[1]["dup_5gram_frac"] == 0.0
    assert got[2]["top_bigram_count"] == 1  # all ties -> lexicographically first
    assert got[2]["top_bigram"] == "s q"
    assert got[3]["top_bigram"] is None and got[3]["n_bigrams"] == 0
    assert got[3]["top_bigram_frac"] == 0.0 and got[3]["dup_5gram_frac"] == 0.0


def test_repetition_dup_5gram_saturates(spark):
    df = spark.createDataFrame([(1, " ".join(["t"] * 12))], ["doc_id", "text"])
    row = repetition_stats(df).collect()[0]
    # every 5-gram is 't t t t t' (8 positions, all duplicates)
    assert row["dup_5gram_frac"] == 1.0
    assert row["top_bigram"] == "t t" and row["top_bigram_count"] == 11


def test_hashed_classifier_deterministic_and_bounded(spark):
    docs = _docs(spark)
    a = hashed_classifier_score(docs).orderBy("doc_id").collect()
    b = hashed_classifier_score(docs).orderBy("doc_id").collect()
    assert a == b
    for r in a[:50]:
        assert -1.0 <= r["logit"] <= 1.0
        assert r["label"] == (r["logit"] >= 0)


def test_hashed_classifier_matches_python_fold(spark):
    import hashlib

    text = "the quick brown fox"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = hashed_classifier_score(df).collect()[0]
    acc = 0.0
    for t in text.split():
        bucket = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 2001
        acc += (bucket - 1000) / 1000.0
    assert abs(row["logit"] - round(acc / 4, 6)) < 1e-12
    assert row["n_tokens"] == 4
