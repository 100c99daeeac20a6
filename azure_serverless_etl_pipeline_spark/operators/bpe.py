"""BPE tokenizer fitting & application (north-star extension).

Byte-pair-encoding merge learning re-expressed for Spark's execution
model. The only corpus-sized step is ONE distributed scan reducing the
corpus to a word-frequency table (``groupBy word`` — the classical BPE
sufficient statistic: merge ranks depend only on word counts, never on
word order). Merge learning then runs on the top-``vocab_cap`` rows of
that table — a bounded KB/MB-scale artifact collected to the driver the
same way the PQ codebook (ann_index.py) and k-means centroids are: this
is how production tokenizer trainers work (word-count statistics, not a
corpus pass per merge), and at 100 TB the scan is the only cost that
grows with the data.

The trainer maintains pair counts INCREMENTALLY (only words containing
the merged pair are re-counted each round, via a pair -> word inverted
index) — the naive full-recount trainer is kept as the independent
pytest reference (test_bpe.py), so the optimization is differentially
verified rather than trusted.

Application (``bpe_segment_stats``) never runs Python over the corpus:
the corpus-sized work is a JVM-side explode + groupBy to (group, word,
count); segmentation runs in an Arrow-batched pandas UDF over the
DISTINCT-word frame only (vocab-sized), and piece counts flow back
through one vocab-keyed join. Zipf does the rest.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import tokens

# End-of-word sentinel: distinguishes "t h e </w>" from the prefix "the"
# of "theory" so merges learned on word counts respect word boundaries.
EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The BPE sufficient statistic: (word, wc) — one scan, one shuffle."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _merge_all(syms: list[str], a: str, b: str) -> list[str]:
    """Merge every non-overlapping (a, b) occurrence, left to right."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _word_pairs(syms: list[str]) -> Counter:
    c: Counter = Counter()
    for i in range(len(syms) - 1):
        c[(syms[i], syms[i + 1])] += 1
    return c


def fit_bpe_merges(
    df: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    vocab_cap: int = 20_000,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, count)] in
    rank order. Deterministic: ties on pair count break to the
    lexicographically smallest (left, right), and the vocab cap keeps
    the most frequent words with the same word-order tie-break.

    Scale shape: the corpus contributes exactly one scan+shuffle (the
    word-count aggregate); everything after runs on <= vocab_cap rows.
    """
    wc_rows = (
        word_counts(df, text_col)
        .orderBy(F.desc("wc"), "word")
        .limit(vocab_cap)
        .collect()
    )
    words: list[tuple[list[str], int]] = [
        (list(r["word"]) + [EOW], int(r["wc"])) for r in wc_rows
    ]

    # Global pair counts + inverted index pair -> word ids containing it.
    pair_counts: Counter = Counter()
    index: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, c) in enumerate(words):
        for pair, k in _word_pairs(syms).items():
            pair_counts[pair] += k * c
            index[pair].add(wi)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        if best_n <= 0:
            break
        best = min(p for p, n in pair_counts.items() if n == best_n)
        merges.append((best[0], best[1], best_n))
        # Incremental maintenance: only words containing `best` change.
        for wi in sorted(index[best]):
            syms, c = words[wi]
            for pair, k in _word_pairs(syms).items():
                pair_counts[pair] -= k * c
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
                index[pair].discard(wi)
            new_syms = _merge_all(syms, best[0], best[1])
            words[wi] = (new_syms, c)
            for pair, k in _word_pairs(new_syms).items():
                pair_counts[pair] += k * c
                index[pair].add(wi)
    return merges


def segment_word(word: str, rank_of: dict[tuple[str, str], int]) -> list[str]:
    """BPE inference: repeatedly merge all occurrences of the
    lowest-ranked adjacent pair present — the exact inverse of the
    training loop's ordering, so training-corpus words reproduce their
    training-time segmentation."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank: int | None = None
        best_pair: tuple[str, str] | None = None
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _merge_all(syms, best_pair[0], best_pair[1])
    return syms


def bpe_segment_stats(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-``group_col`` BPE token accounting under a learned merge
    table: (group, n_words, n_pieces, pieces_per_word).

    The corpus-sized work is JVM-side (explode + two-key groupBy);
    Python segmentation runs ONLY on the distinct-word frame via an
    Arrow-batched pandas UDF with the merge ranks in a broadcast — at
    100 TB the UDF input is the vocabulary, not the corpus.
    """
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    b_ranks = spark.sparkContext.broadcast(ranks)

    @pandas_udf(T.IntegerType())
    def n_pieces(words):  # type: ignore[no-untyped-def]
        r = b_ranks.value
        return words.map(lambda w: len(segment_word(w, r))).astype("int32")

    per_word = (
        df.select(group_col, F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy(group_col, "word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = per_word.select("word").distinct().withColumn(
        "pieces", n_pieces(F.col("word"))
    )
    return (
        per_word.join(vocab, "word")
        .groupBy(group_col)
        .agg(
            F.sum("wc").cast("long").alias("n_words"),
            F.sum(F.col("wc") * F.col("pieces")).cast("long").alias("n_pieces"),
        )
        .withColumn(
            "pieces_per_word",
            F.round(F.col("n_pieces") / F.col("n_words"), 6),
        )
    )
