"""Unit semantics for bigram/redaction/repetition operators (oracle parity
is in test_queries_oracle; these pin the operator-level contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_redact_noop_on_clean_text(spark):
    from azure_serverless_etl_pipeline_spark.operators.text import redact_pii
    from azure_serverless_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    out = redact_pii(docs)
    agg = out.agg(
        F.sum("n_emails").alias("e"), F.sum("n_phones").alias("p")
    ).collect()[0]
    assert agg["e"] == 0 and agg["p"] == 0
    # text untouched when nothing matches
    diff = out.join(
        docs.select("doc_id", F.col("text").alias("orig")), "doc_id"
    ).filter(F.col("text") != F.col("orig"))
    assert diff.count() == 0


def test_redact_counts_and_replaces(spark):
    from azure_serverless_etl_pipeline_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a@b.io and c.d+x@e-f.org or 555-123-4567 twice 555-000-1111")],
        "doc_id int, text string",
    )
    row = redact_pii(df).collect()[0]
    assert row["n_emails"] == 2 and row["n_phones"] == 2
    assert "[EMAIL]" in row["text"] and "[PHONE]" in row["text"]
    assert "@" not in row["text"] and "555-" not in row["text"]


def test_bigram_total_is_token_count_minus_docs(spark):
    from azure_serverless_etl_pipeline_spark.operators.text import bigram_counts
    from azure_serverless_etl_pipeline_spark.functions import tokens
    from azure_serverless_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    total_bigrams = bigram_counts(docs).agg(F.sum("n")).collect()[0][0]
    per_doc = docs.select(
        F.greatest(F.size(tokens(F.col("text"))) - 1, F.lit(0)).alias("m")
    )
    assert total_bigrams == per_doc.agg(F.sum("m")).collect()[0][0]


def test_dup_ratio_extremes(spark):
    from azure_serverless_etl_pipeline_spark.operators.text import dup_ngram_ratio

    df = spark.createDataFrame(
        [(1, "a a a a a"), (2, "v w x y z"), (3, "solo")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in dup_ngram_ratio(df).collect()}
    assert got[1]["dup_ratio"] == 0.75  # 4 bigrams, 1 distinct
    assert got[2]["dup_ratio"] == 0.0
    assert got[3]["n_bigrams"] == 0 and got[3]["dup_ratio"] == 0.0


def test_unigram_logprob_ranks_rare_vocab(spark):
    """A doc made of corpus-rare tokens must score higher (more
    surprising) than a doc of corpus-common tokens."""
    from azure_serverless_etl_pipeline_spark.operators.text import unigram_logprob

    rows = [(i, "the common words appear here always") for i in range(20)]
    rows.append((100, "zyx qwv jjkk zzz pqr"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {r.doc_id: r.avg_neg_logprob for r in unigram_logprob(df).collect()}
    assert scores[100] > scores[0]
    # common docs all score identically (same token multiset)
    assert len({scores[i] for i in range(20)}) == 1


def test_bigram_pmi_planted_collocation(spark):
    """A planted rigid collocation ("hong kong": always adjacent, its
    words never appear apart) must out-rank pairs of independent
    high-frequency words; PMI of an independent pair is near ln(1)=0."""
    import math

    from azure_serverless_etl_pipeline_spark.operators.text import bigram_pmi

    rows = []
    for i in range(60):
        # "hong kong" appears once per doc; "the data" co-occur sometimes
        # but both words are everywhere
        rows.append((i, f"the data hong kong the data set u{i} the set"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bigram_pmi(df, min_count=3, top_k=10).toPandas()
    top = (out.iloc[0]["w1"], out.iloc[0]["w2"])
    assert top == ("hong", "kong")
    hk = out[(out.w1 == "hong") & (out.w2 == "kong")].iloc[0]
    # exact: c_ab=c_a=c_b=60 -> pmi = ln(N_uni^2 / (N_bi * 60))
    n_uni = 60 * 10
    n_bi = 60 * 9
    assert abs(hk["pmi"] - round(math.log(n_uni**2 / (n_bi * 60)), 6)) < 1e-9


def test_token_count_bpe_matches_python_re(spark):
    """The BPE-ish pre-token count must equal Python re.findall with the
    same pattern (Java regex, RE2, and Python agree on this
    lookahead-free subset) on contraction/punctuation/digit-heavy text."""
    import re

    from azure_serverless_etl_pipeline_spark.operators.text import (
        BPE_SPLIT_RE,
        token_count_bpe,
    )

    rows = [
        (0, "it's the 42nd test-case, isn't it?"),
        (1, "we'll've seen 1,000 tokens... maybe 2000!"),
        (2, "plain words only here"),
        (3, "!!!"),
        (4, "don't"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = token_count_bpe(df).toPandas().set_index("doc_id")
    for doc_id, text in rows:
        expect = len(re.findall(BPE_SPLIT_RE, text))
        assert out.loc[doc_id, "n_bpe_tokens"] == expect, (doc_id, text)
        assert out.loc[doc_id, "n_ws_tokens"] == len(text.split())
