"""Text analysis operators (north-star extension).

Language ID (stopword-marker heuristic), quality scoring, token counting,
and document fingerprinting over the ``documents`` table. All arithmetic
is ratios of integers -> bit-exact across engines, so text_stats /
quality_score / lang_profile carry full SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import tokens, word_shingles

_SEED = 42

# Deterministic English-ish stopword markers (subset present in the
# synthetic corpus vocabulary). Shared with the DuckDB oracle.
STOPWORDS = ("the", "a", "of", "and", "or", "in", "on", "to", "is")

# Tiny marker lexicons for the language-ID heuristic. With the synthetic
# corpus (English-vocab text + a lang column) this exercises the plumbing;
# swap the lexicons for real per-language n-gram tables in production.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "了", "是", "我", "在"),
}


def _stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def _bigrams_of(toks: Column) -> Column:
    """Position-ordered bigram array off a token-array column (the
    repetition rule's input) — shared by the inline and staged forms of
    ``quality_rules`` so the definition cannot drift."""
    n_tok = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, F.greatest(n_tok - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n_tok - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def quality_rules(
    text_col: str = "text",
    toks: Column | None = None,
    grams: Column | None = None,
) -> dict[str, Column]:
    """The Gopher-style composite gate rules — SINGLE source of truth for
    the x46 audit query and corpus_pipeline.quality_gate (one drift bug
    away from gate != audit otherwise). Returns named boolean columns;
    all integer-ratio arithmetic, oracle-exact, fused into the scan's
    codegen span (map-side only).

    Rules: token-count band 10..1000, [a-z] char ratio >= 0.6, >= 1
    stopword, duplicate-bigram fraction <= 0.5.

    ``toks``/``grams`` optionally reference PRE-STAGED columns (r14,
    guide §1.2): the rules reference the token array ~5x and the bigram
    array 3x, and separate expressions in one projection share nothing —
    the interpreted split/zip_with chains re-ran per reference. An audit
    projection stages both arrays as their own projection step
    (CollapseProject keeps multiply-referenced non-cheap projections
    separate, so each is evaluated once per row) and passes the column
    refs in; the inline default remains for filter contexts, where a
    staged column would be substituted right back by filter pushdown.
    """
    toks = tokens(F.col(text_col)) if toks is None else toks
    n_tok = F.size(toks)
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^a-z]", ""))
    alpha_ratio = alpha / F.length(F.col(text_col))
    n_stop = _stopword_count(toks)
    grams = _bigrams_of(toks) if grams is None else grams
    dup_ratio = F.when(
        F.size(grams) > 0, 1 - F.size(F.array_distinct(grams)) / F.size(grams)
    ).otherwise(F.lit(0.0))
    return {
        "ok_length": n_tok.between(10, 1000),
        "ok_alpha": alpha_ratio >= 0.6,
        "ok_stopwords": n_stop >= 1,
        "ok_repetition": dup_ratio <= 0.5,
    }


def quality_rules_all(text_col: str = "text") -> Column:
    """Conjunction of every quality_rules column (the pass/fail gate)."""
    rules = list(quality_rules(text_col).values())
    out = rules[0]
    for r in rules[1:]:
        out = out & r
    return out


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token/char statistics (token counting operator).

    n_tokens: whitespace tokens; avg_token_len: (chars minus whitespace) /
    n_tokens; alpha_ratio: share of [a-z] chars. Integer-ratio doubles ->
    oracle-exact.
    """
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    non_ws = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^a-z]", ""))
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_actual"),
        F.round(non_ws / n_tokens, 6).alias("avg_token_len"),
        F.round(alpha / n_chars, 6).alias("alpha_ratio"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_len: int = 500,
    threshold: float = 0.5,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality score in [0,1]: content-word share + length score.

    score = 0.5*(1 - stopword_ratio) + 0.5*min(n_chars/target_len, 1).
    Mirrors the classic pre-training quality filters (length, stopword
    density); deterministic and oracle-exact. ``extra_cols`` pass through
    unchanged (avoids a re-join when the caller needs grouping columns,
    e.g. x103's per-source calibration).
    """
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    stop_ratio = _stopword_count(toks) / n_tokens
    len_score = F.least(F.length(F.col(text_col)) / F.lit(float(target_len)), F.lit(1.0))
    score = F.lit(0.5) * (F.lit(1.0) - stop_ratio) + F.lit(0.5) * len_score
    return df.select(
        F.col(id_col),
        *extra_cols,
        F.round(score, 6).alias("quality"),
        (score >= F.lit(threshold)).alias("is_high_quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker hits.

    Returns (id, predicted_lang, marker_hits). Ties resolve to the
    lexicographically smallest language code (deterministic).
    """
    toks = tokens(F.col(text_col))

    def marker_hits(markers: tuple[str, ...]):
        # closure (not a default arg) — a 2-arg lambda would be treated as
        # the (value, index) higher-order-function form by PySpark
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    # struct comparison is field-order lexicographic: hits desc via array_max,
    # ties broken toward the smallest lang code via the negated index field.
    scores = F.array(
        *[
            F.struct(
                marker_hits(markers).alias("hits"),
                F.lit(-i).alias("tie"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, markers) in enumerate(sorted(LANG_MARKERS.items()))
        ]
    )
    best = F.array_max(scores)
    return df.select(
        F.col(id_col),
        best["lang"].alias("predicted_lang"),
        best["hits"].alias("marker_hits"),
    )


def lang_profile(df: DataFrame) -> DataFrame:
    """Corpus profile per declared language: doc count, char stats, sources."""
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_chars") / F.count(F.lit(1)), 6).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 8
) -> DataFrame:
    """Winnowing-style document fingerprint: min/max xxhash over word
    8-grams plus full-text hash. Used for fast exact/near-exact lookup
    keys at ingest; engine-specific hashes -> rows-only correctness.
    """
    shingles = word_shingles(F.col(text_col), n)
    grams = F.when(
        F.size(shingles) > 0,
        F.transform(shingles, lambda s: F.xxhash64(F.lit(_SEED), s)),
    ).otherwise(F.array(F.xxhash64(F.lit(_SEED), F.col(text_col))))
    return df.select(
        F.col(id_col),
        F.xxhash64(F.lit(_SEED), F.col(text_col)).alias("exact_hash"),
        F.array_min(grams).alias("min_gram_hash"),
        F.array_max(grams).alias("max_gram_hash"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (idf = ln(N/df)).

    Fully distributed: explode tokens -> per-(doc,term) counts (one
    shuffle, map-side partial agg), document frequency from that same
    aggregate (second shuffle on term, output is vocabulary-sized), N as
    a 1-row broadcast. Top-k per doc is a row_number window over the
    doc_id partitioning the tf aggregate already established. Scores are
    rounded to 6 decimals (ln is correctly-rounded in neither engine;
    everything else is exact-integer arithmetic).
    """
    from pyspark.sql import Window as W

    term = F.explode(tokens(F.col(text_col))).alias("term")
    tf = df.select(F.col(id_col), term).groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # doc_freq as a WINDOW count over the term partition of tf — the
    # former tf.groupBy(term)+join-back branch shared no exchange with
    # the scoring side (different partial aggregates), so Spark re-ran
    # the whole explode+shuffle for it (measured: 0 ReusedExchange, 2x
    # scans). The window needs the same term exchange the join needed,
    # minus the duplicate corpus pass; it is vocabulary-distributed.
    dfreq = F.count(F.lit(1)).over(W.partitionBy("term"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.withColumn("doc_freq", dfreq)
        # n_docs is a literal 1-row frame; the hint is safe.
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("doc_freq")), 6),
        )
    )

    rn = F.row_number().over(
        W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    )
    return (
        scored.withColumn("rank", rn)
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "tfidf", "rank")
    )


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level bigram frequencies (LM-style n-gram count table).

    All occurrences (not per-doc distinct): zip the token array with its
    1-shifted self, explode, hash-aggregate. Map-side partial agg does
    the heavy lifting; the shuffle moves only (bigram, partial-count)
    pairs — vocabulary-squared bounded by total corpus tokens.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex PII redaction (emails, NANP-style phone numbers) with match
    accounting — the scrubbing pass a training corpus runs before
    anything else. Pure regexp_replace/regexp_count: JVM-side, fuses
    into the scan's codegen span, no UDF.
    """
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(c, PII_EMAIL_RE, "[EMAIL]"), PII_PHONE_RE, "[PHONE]"
    )
    return df.withColumn("n_emails", n_emails).withColumn(
        "n_phones", n_phones
    ).withColumn(text_col, redacted)


def dup_ngram_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition/boilerplate score: fraction of bigram occurrences that
    are duplicates of an earlier bigram in the same document (Gopher-rule
    style duplicate-n-gram fraction). Integer-ratio double -> oracle-exact.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    return df.select(
        F.col(id_col),
        n_grams.alias("n_bigrams"),
        n_distinct.alias("n_distinct_bigrams"),
        F.when(n_grams > 0, F.round(1 - n_distinct / n_grams, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram-LM quality score: per-document average negative log
    probability under the corpus's own unigram distribution (the
    perplexity proxy used to rank training documents — high = rare/noisy
    vocabulary, low = stereotypical text).

    Fully distributed and vocabulary-bounded like tfidf_top_terms:
    explode -> per-(doc,term) counts (one shuffle), term frequencies from
    the same aggregate (vocabulary-sized second shuffle, broadcast back),
    corpus token total as a 1-row broadcast. Per-term contributions are
    rounded to 8 decimals and decimal-summed so the per-doc total is
    order-independent (float addition is not associative; ln itself
    bit-matches across engines, per the x36 convention).
    """
    from pyspark.sql import Window as W

    term = F.explode(tokens(F.col(text_col))).alias("term")
    tf = df.select(F.col(id_col), term).groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # term frequency as a WINDOW sum over tf's term partition (same
    # single-pass rationale as tfidf_top_terms: the groupBy+join-back
    # branch duplicated the explode+shuffle). The corpus token total is
    # Σtf — a 1-row aggregate OF tf (its exchange is reused), broadcast
    # back.
    freq = F.sum("tf").over(W.partitionBy("term"))
    total = tf.agg(F.sum("tf").alias("t_total"))
    contrib = (
        tf.withColumn("c", freq)
        .join(F.broadcast(total))
        .withColumn(
            "w",
            F.round(
                F.col("tf") * F.log(F.col("t_total") / F.col("c")), 8
            ).cast("decimal(18,8)"),
        )
    )
    return (
        contrib.groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            (F.sum("w").cast("double") / F.sum("tf")).alias("raw"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("raw"), 6).alias("avg_neg_logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram-LM quality score: per-document average negative
    log probability of each token given its predecessor,
    -ln(λ·P(w|v) + (1-λ)·P(w)), under the corpus's own counts — the
    distributed analog of CCNet-style n-gram-LM perplexity filtering and
    the context-aware upgrade of unigram_logprob (x72): a common word in
    an unusual context now scores as surprising.

    Plan shape mirrors x72: bigrams come from a zip_with of the token
    array with its 1-shifted self (no per-doc window/sort), one shuffle
    to (doc, v, w) counts, then three bounded model tables — bigram
    counts, previous-token margins (both vocabulary-bounded), and the
    unigram table — joined back; the 1-row token total broadcasts.
    Per-position contributions are rounded to 8 decimals and
    decimal-summed (order-independent; ln/division bit-match across
    engines on identical integer inputs). Docs with <2 tokens have no
    bigram positions and drop out, by definition.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("v"), b.alias("w")),
    )
    # (doc, v, w, k) is the sufficient statistic every model table and
    # the scoring join derive from; localCheckpoint it (eager, computed
    # per invocation inside the caller's timed region) so the corpus is
    # tokenized/exploded/shuffled ONCE — the lazy shape re-executed this
    # subtree three times (bi, prev-via-bi, and the contrib join; r13
    # opt, guide §1.2: one pass for one statistic).
    doc_bi = (
        df.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, "p.v", "p.w")
        .groupBy(id_col, "v", "w")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint()
    )
    bi = doc_bi.groupBy("v", "w").agg(F.sum("k").alias("cb"))
    prev = bi.groupBy("v").agg(F.sum("cb").alias("cp"))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    total = uni.agg(F.sum("cu").alias("t_total"))
    p_bi = F.col("cb").cast("double") / F.col("cp")
    p_uni = F.col("cu").cast("double") / F.col("t_total")
    contrib = (
        doc_bi.join(bi, ["v", "w"])
        .join(prev, "v")
        .join(uni, "w")
        .join(F.broadcast(total))
        .withColumn(
            "contrib",
            F.round(
                F.col("k") * -F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni),
                8,
            ).cast("decimal(18,8)"),
        )
    )
    return (
        contrib.groupBy(id_col)
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            (F.sum("contrib").cast("double") / F.sum("k")).alias("raw"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(F.col("raw"), 6).alias("avg_neg_logprob"),
        )
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
    top_k: int = 50,
) -> DataFrame:
    """Collocation extraction: pointwise mutual information over adjacent
    token pairs, PMI = ln(P(w1 w2) / (P(w1) P(w2))) — the classic
    corpus-analysis signal for multiword expressions, computed as a sum
    of logs (ln c_ab + 2 ln N_uni - ln N_bi - ln c_1 - ln c_2) so no
    integer product can overflow at corpus scale and the arithmetic is
    reproducible term-for-term in the SQL oracle.

    Plan shape: the x40 bigram count table and the unigram count table
    (both vocabulary-sized after map-side partial aggregation) join on
    the two token columns — strategy left to AQE, same policy as
    tfidf_top_terms — and the two 1-row totals broadcast. min_count
    gates the long tail BEFORE the joins (low-count bigrams dominate the
    table and their PMI is noise), top_k orders by (pmi desc, w1, w2)
    for a deterministic cut.
    """
    toks = tokens(F.col(text_col))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    bi = bigram_counts(df, text_col)
    n_bi = bi.agg(F.sum("n").alias("n_bi"))
    scored = (
        bi.filter(F.col("n") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi))
        .withColumn(
            "pmi",
            F.round(
                F.log("n") + 2 * F.log("n_uni") - F.log("n_bi")
                - F.log("c1") - F.log("c2"),
                6,
            ),
        )
    )
    return (
        scored.select("w1", "w2", F.col("n").alias("n_ab"), "pmi")
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )


# GPT-2-style pre-tokenizer pattern, simplified to the lookahead-free
# subset Java regex and RE2 both support with identical leftmost-first
# alternation semantics: contractions, optional-space letter runs,
# optional-space digit runs, optional-space punctuation runs. The real
# byte-level BPE merges AFTER this split; counting pre-tokens is the
# standard cheap estimate of trained-tokenizer token counts.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+"


def token_count_bpe(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token counts under BOTH tokenization regimes the
    north-star asks for: whitespace tokens and BPE-ish pre-tokens
    (``BPE_SPLIT_RE`` matches), plus chars-per-pre-token (the
    compression-rate proxy used for budget planning before a real
    tokenizer pass). All JVM-side regexp_count / length arithmetic —
    map-side only, fused into the scan's codegen span.
    """
    n_ws = F.size(tokens(F.col(text_col)))
    n_bpe = F.regexp_count(F.col(text_col), F.lit(BPE_SPLIT_RE))
    return df.select(
        F.col(id_col),
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(
            F.when(n_bpe > 0, F.length(F.col(text_col)) / n_bpe).otherwise(0.0),
            6,
        ).alias("chars_per_bpe_token"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition metrics, computed MAP-ONLY (zero shuffles).

    Per document: the most frequent bigram (ties -> lexicographically
    smallest), the fraction of bigram positions it occupies, and the
    fraction of 5-gram positions whose gram occurs more than once in the
    same document (the duplicate-n-gram rule from the Gopher quality
    filters). Everything is integer-ratio arithmetic over token arrays via
    higher-order functions — no explode, no groupBy, so at 100 TB this is
    a pure scan: cost O(distinct_grams x grams) per row inside codegen,
    and the operator scales linearly with input splits.
    """
    from ..functions import word_grams

    # Sorted gram arrays: every repetition metric below is O(n log n) sort
    # + O(n) adjacent-neighbor scans per row (an argmax via
    # count-each-distinct-gram re-filtering is O(distinct x n) per row and
    # measured ~5x slower at sf0.1).
    base = df.select(
        F.col(id_col),
        F.array_sort(word_grams(F.col(text_col), 2)).alias("g2"),
        F.array_sort(word_grams(F.col(text_col), 5)).alias("g5"),
    )
    g2, g5 = F.col("g2"), F.col("g5")

    # Single fold over the SORTED bigrams tracking (prev gram, current run
    # length, best count, best gram). Strict > keeps the FIRST gram that
    # reaches the max run, which in sorted order is the lexicographically
    # smallest — the same tie-break as ORDER BY c DESC, gram ASC.
    best = F.aggregate(
        g2,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("c"),
            F.lit(None).cast("string").alias("g"),
        ),
        lambda acc, g: (
            lambda run: F.struct(
                g.alias("prev"),
                run.alias("run"),
                F.when(run > acc["c"], run).otherwise(acc["c"]).alias("c"),
                F.when(run > acc["c"], g).otherwise(acc["g"]).alias("g"),
            )
        )(F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))),
    )
    n2 = F.size(g2)
    n5 = F.size(g5)
    # A 5-gram position is a duplicate iff it equals a sorted neighbor.
    eq_next = F.zip_with(
        g5,
        F.slice(g5, 2, F.greatest(n5 - 1, F.lit(0))),
        lambda a, b: F.coalesce(a == b, F.lit(False)),
    )
    eq_prev = F.concat(
        F.array(F.lit(False)), F.slice(eq_next, 1, F.greatest(n5 - 1, F.lit(0)))
    )
    dup5 = F.size(
        F.filter(F.zip_with(eq_next, eq_prev, lambda a, b: a | b), lambda x: x)
    )
    return base.select(
        F.col(id_col),
        n2.cast("long").alias("n_bigrams"),
        best["g"].alias("top_bigram"),
        best["c"].cast("long").alias("top_bigram_count"),
        F.when(n2 > 0, F.round(best["c"] / n2, 6))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(n5 > 0, F.round(dup5 / n5, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_5gram_frac"),
    )


def hashed_classifier_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Hashed linear quality classifier (fasttext-style), fully JVM-side.

    Each token hashes to a deterministic weight in [-1, 1]
    (md5 first-8-hex fold mod 2001, shifted/scaled — the same stable-hash
    convention as operators/sampling.hash_bucket, so the model is
    reproducible on any engine with md5). The document logit is the MEAN
    token weight via a sequential left fold; both Spark `aggregate` and
    DuckDB `list_reduce` fold left-to-right from an exact-zero seed, so
    the double result is bit-identical and safe to hash-check. The
    sigmoid is deliberately omitted from the output: it is monotone, so
    `label = logit >= 0` is the same decision boundary, and exp() is the
    one primitive whose last ULP differs across engines.

    In production the hash->weight table would come from a trained model
    broadcast as a map literal; the scoring plan (scan -> transform ->
    fold, zero shuffles) is identical.
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("toks"))

    def weight(t):
        bucket = (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % 2001
        )
        return (bucket - 1000) / F.lit(1000.0)

    n = F.size(F.col("toks"))
    total = F.aggregate(F.col("toks"), F.lit(0.0), lambda acc, t: acc + weight(t))
    logit = F.when(n > 0, total / n).otherwise(F.lit(0.0))
    # floor(x*1e6+0.5)/1e6, NOT round(x, 6): the mean of 1/1000-unit
    # weights lands exactly ON 1e-6 round midpoints for some token
    # counts, where Spark's exact-decimal HALF_UP and DuckDB's
    # float-space round diverge (measured: 3/5000 docs off by 1e-6 at
    # sf0.1). The floor form is a fixed IEEE chain — identical bits on
    # any engine. Same discipline as x110's centroid quantization.
    q = F.floor(logit * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    # label derives from the QUANTIZED logit so the emitted (logit, label)
    # pair is internally consistent: a raw logit in [-5e-7, 0) prints as
    # 0.0 and must carry label=true, not false (mirrored in the oracle).
    return base.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        q.alias("logit"),
        (q >= 0).alias("label"),
    )
