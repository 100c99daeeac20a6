"""Benchmark decontamination (north-star extension).

Training corpora must not contain evaluation data: any document sharing a
long-enough token n-gram with a benchmark document is "contaminated" and
has to be dropped before training (the n-gram-overlap rule used by GPT-3,
PaLM, and the Pile decontamination pipelines). The reference app has no
notion of this; it is a first-class requirement for the 100 TB training-
data pipeline this engine targets.

Scale shape: the benchmark side is SMALL (eval suites are a few thousand
documents) while the corpus is the 100 TB side. We therefore
 1. build the DISTINCT eval n-gram set (tiny — eligible for a broadcast
    hash join, AQE decides from actual size),
 2. explode corpus docs into distinct n-grams ONCE (map-side, no shuffle
    until the join),
 3. semi-join corpus grams against eval grams and count matches per doc.
The corpus is never self-joined and never collected; cost is one shuffle
of the (doc_id, gram) stream keyed by gram — the same shape as the
inverted-index dedup in dedup.ngram_jaccard_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import word_shingles


def eval_ngram_set(eval_df: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """Distinct token n-grams over the benchmark/eval documents."""
    return (
        eval_df.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-corpus-doc contamination stats vs the eval set.

    Returns one row per corpus document that shares >= 1 distinct token
    n-gram with ANY eval document: (id_col, n_shared_grams). Documents
    with zero overlap produce no row (the common case at scale — keep the
    output proportional to the contamination, not the corpus).
    """
    evg = eval_ngram_set(eval_df, n, text_col)
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    return (
        corpus_grams.join(evg, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The filtered corpus: drop every document sharing an n-gram with the
    eval set (anti-join on the contamination report — one extra shuffle on
    the small flagged-id set, corpus passes through unchanged otherwise).
    """
    flagged = contamination_report(corpus, eval_df, n, id_col, text_col).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")
