"""BPE trainer/segmenter vs an independent naive pure-Python reference.

The operator maintains pair counts incrementally (inverted index, only
re-counting words that contain the merged pair); the reference here
recounts every pair over every word each round — structurally different
code computing the same contract, so the optimization is differentially
verified.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from tests.conftest import SF_ORACLE

EOW = "</w>"


def _corpus_word_counts(spark) -> dict[str, int]:
    rows = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("text")
        .collect()
    )
    wc: Counter = Counter()
    for r in rows:
        for w in re.split(r"\s+", r["text"].strip()):
            if w:
                wc[w] += 1
    return dict(wc)


def naive_fit(word_counts: dict[str, int], n_merges: int, vocab_cap: int):
    """Full-recount trainer: every round recounts all pairs of all words."""
    kept = sorted(word_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap]
    vocab = {w: list(w) + [EOW] for w, _ in kept}
    counts_of = dict(kept)
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            c = counts_of[w]
            for pair in zip(syms, syms[1:]):
                pc[pair] += c
        if not pc:
            break
        best_n = max(pc.values())
        best = min(p for p, n in pc.items() if n == best_n)
        merges.append((best[0], best[1], best_n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def fitted(spark):
    from azure_serverless_etl_pipeline_spark.operators import bpe

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    merges = bpe.fit_bpe_merges(docs, n_merges=40, vocab_cap=20_000)
    ref_merges, ref_vocab = naive_fit(_corpus_word_counts(spark), 40, 20_000)
    return merges, ref_merges, ref_vocab


def test_fit_matches_naive_reference(fitted):
    merges, ref_merges, _ = fitted
    assert merges == ref_merges
    assert len(merges) == 40
    # counts are monotone non-increasing only per greedy invariant? No —
    # a merge can CREATE a more frequent pair; assert positivity instead.
    assert all(n > 0 for _, _, n in merges)


def test_segmentation_reproduces_training_vocab(fitted):
    """segment_word on a training word must reproduce the trainer's
    final symbol sequence (inference == training fixed point), and the
    pieces must concatenate back to the word + EOW (losslessness)."""
    from azure_serverless_etl_pipeline_spark.operators import bpe

    merges, _, ref_vocab = fitted
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for w, expected in list(ref_vocab.items())[:500]:
        got = bpe.segment_word(w, ranks)
        assert got == expected, w
        assert "".join(got) == w + EOW


def test_segment_stats_match_pure_python(spark, fitted):
    """End-to-end x133 stats vs a pure-Python pipeline (naive merges +
    naive segmentation over collected rows)."""
    from azure_serverless_etl_pipeline_spark.operators import bpe

    merges, _, _ = fitted
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = {
        r["source"]: (r["n_words"], r["n_pieces"], r["pieces_per_word"])
        for r in bpe.bpe_segment_stats(docs, merges).collect()
    }

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    memo: dict[str, int] = {}
    agg: dict[str, list[int]] = {}
    for r in docs.select("source", "text").collect():
        words = [w for w in re.split(r"\s+", r["text"].strip()) if w]
        a = agg.setdefault(r["source"], [0, 0])
        for w in words:
            if w not in memo:
                memo[w] = len(bpe.segment_word(w, ranks))
            a[0] += 1
            a[1] += memo[w]
    want = {
        s: (nw, np, round(np / nw, 6)) for s, (nw, np) in agg.items()
    }
    assert got == want


def test_unseen_word_falls_back_to_chars(fitted):
    from azure_serverless_etl_pipeline_spark.operators import bpe

    merges, _, _ = fitted
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    out = bpe.segment_word("zzqxv", ranks)
    assert "".join(out) == "zzqxv" + EOW
    # no merge rank covers this word's pairs unless learned organically;
    # either way the segmentation is a valid partition of the chars.
    assert all(p for p in out)


def test_queries_registered_and_run(spark):
    from azure_serverless_etl_pipeline_spark.plans import all_queries

    q = all_queries()
    m = q["x132_bpe_merges"](spark, SF_ORACLE)
    assert m.columns == ["rank", "left", "right", "merged", "pair_count"]
    assert m.count() == 40
    s = q["x133_bpe_segment_stats"](spark, SF_ORACLE)
    rows = s.collect()
    assert rows and all(r["pieces_per_word"] >= 1.0 for r in rows)
