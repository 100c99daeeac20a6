"""Deterministic split/sampling properties: engine-independence is covered
by the oracle parity tests; here we assert the *stability* properties that
motivate hash bucketing over RNG sampling, plus TF-IDF semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _docs(spark):
    from azure_serverless_etl_pipeline_spark.sources import load_table

    return load_table(spark, SF_ORACLE, "documents")


def test_split_stable_under_repartition(spark):
    from azure_serverless_etl_pipeline_spark.operators.sampling import (
        deterministic_split,
    )

    docs = _docs(spark)
    a = deterministic_split(docs).select("doc_id", "split").toPandas()
    b = (
        deterministic_split(docs.repartition(7, "lang"))
        .select("doc_id", "split")
        .toPandas()
    )
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert len(merged) == len(a)
    assert (merged["split_a"] == merged["split_b"]).all()


def test_split_proportions(spark):
    from azure_serverless_etl_pipeline_spark.operators.sampling import (
        deterministic_split,
    )

    counts = (
        deterministic_split(_docs(spark)).groupBy("split").count().toPandas()
    ).set_index("split")["count"]
    n = counts.sum()
    # md5 is uniform; 500 docs -> binomial std ~ sqrt(500*0.8*0.2) ~ 9
    assert abs(counts["train"] / n - 0.80) < 0.08
    assert abs(counts["val"] / n - 0.10) < 0.06
    assert abs(counts["test"] / n - 0.10) < 0.06


def test_stratified_sample_is_subset_and_rate(spark):
    from azure_serverless_etl_pipeline_spark.operators.sampling import (
        stratified_sample,
    )

    docs = _docs(spark)
    kept = stratified_sample(docs, "lang", {"en": 0.3}, default_rate=0.0)
    kp = kept.toPandas()
    assert set(kp["lang"]) <= {"en"}  # default_rate=0 drops other strata
    n_en = docs.filter(F.col("lang") == "en").count()
    if n_en >= 50:
        assert abs(len(kp) / n_en - 0.3) < 0.15
    # subset: every kept doc_id exists in the source
    assert kept.join(docs, "doc_id", "left_anti").count() == 0


def test_tfidf_ranks_and_idf_monotonicity(spark):
    from azure_serverless_etl_pipeline_spark.operators.text import tfidf_top_terms

    out = tfidf_top_terms(_docs(spark), k=3).toPandas()
    assert (out["rank"].between(1, 3)).all()
    per_doc = out.groupby("doc_id")["rank"].apply(lambda s: sorted(s.tolist()))
    assert all(r == list(range(1, len(r) + 1)) for r in per_doc)
    # idf monotonicity: within a doc, an equal-tf term with higher doc_freq
    # can never outrank one with lower doc_freq
    for _, g in out.groupby("doc_id"):
        g = g.sort_values("rank")
        for i in range(len(g) - 1):
            a, b = g.iloc[i], g.iloc[i + 1]
            if a["tf"] == b["tf"] and a["tfidf"] != b["tfidf"]:
                assert a["doc_freq"] <= b["doc_freq"]
