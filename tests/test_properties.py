"""Property-based tests (hypothesis): operators vs pure-Python references
on randomized small inputs. max_examples kept low — each example is a
Spark job; the value is in the random structure, not the count."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VOCAB = ["spark", "data", "row", "scan", "join", "the", "fast", "key", "sort"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = [t for t in text.split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_jaccard_pairs(texts: list[str], tau: float) -> set[tuple[int, int]]:
    sh = {i: _py_shingles(t) for i, t in enumerate(texts)}
    out = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = sh[i], sh[j]
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= tau:
                out.add((i, j))
    return out


@SETTINGS
@given(texts=doc_strategy)
def test_jaccard_matches_python_reference(spark, texts):
    from azure_serverless_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = set(
        map(
            tuple,
            ngram_jaccard_pairs(df, threshold=0.5)
            .toPandas()[["id_a", "id_b"]]
            .to_numpy()
            .tolist(),
        )
    )
    assert got == _py_jaccard_pairs(texts, 0.5)


@SETTINGS
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # key
            st.integers(min_value=0, max_value=20),  # day offset
            st.floats(min_value=0.1, max_value=9.9, allow_nan=False),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_densify_invariants(spark, data):
    from azure_serverless_etl_pipeline_spark.operators.timeseries import densify_daily
    from pyspark.sql import functions as F

    base = dt.date(2024, 1, 1)
    rows = [(str(k), base + dt.timedelta(days=d), round(v, 2)) for k, d, v in data]
    df = (
        spark.createDataFrame(rows, "k string, date date, v double")
        .groupBy("k", "date")
        .agg(F.round(F.sum("v"), 4).alias("v"))
    )
    dense = densify_daily(df, "date", ["k"], ["v"]).toPandas()
    src = df.toPandas()
    for k, grp in src.groupby("k"):
        dg = dense[dense.k == k]
        span = (grp["date"].max() - grp["date"].min()).days + 1
        # exactly one row per day in [min, max]
        assert len(dg) == span
        assert dg["date"].nunique() == span
        # zero-fill preserves the total and introduces no NULLs
        assert dg["v"].isna().sum() == 0
        assert abs(dg["v"].sum() - grp["v"].sum()) < 1e-6


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_salted_join_property(spark, rows):
    from azure_serverless_etl_pipeline_spark.operators.skew import salted_join
    from pyspark.sql import functions as F

    big = spark.createDataFrame(
        [(k, round(v, 3)) for k, v in rows] or [(None, None)], "k int, v double"
    ).filter(F.col("k").isNotNull())
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k int, tag string"
    )
    plain = big.join(small, ["k"], "left").toPandas()
    salted = salted_join(big, small, ["k"], how="left", salt_buckets=4).toPandas()
    cols = list(plain.columns)
    assert plain.sort_values(cols, ignore_index=True).equals(
        salted[cols].sort_values(cols, ignore_index=True)
    )


SEP_ALPHABET = [".", "|", "*", "+", "?", "(", ")", "[", "]", "{", "}",
                "^", "$", "\\", "/", "-", "#", "\t", "\n", "~"]


@given(
    sep=st.lists(st.sampled_from(SEP_ALPHABET), min_size=1, max_size=3).map(
        "".join
    ),
    docs=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=5).map("_".join),
        min_size=1,
        max_size=4,
    ),
)
@SETTINGS
def test_line_dedup_separator_is_literal(spark, sep, docs):
    """For ANY separator string — including regex metacharacters like
    ".", "|", "(", "\\" — line_dedup must treat it as a literal: with
    min_docs high enough that nothing is boilerplate, every document
    must round-trip unchanged through split -> rebuild, and n_lines must
    equal the literal-split count."""
    from azure_serverless_etl_pipeline_spark.operators.dedup import line_dedup

    rows = [(i, sep.join([d, f"u{i}"])) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in line_dedup(df, sep=sep, min_docs=len(docs) + 1).collect()
    }
    for i, (doc_id, text) in enumerate(rows):
        assert out[doc_id]["text"] == text, (sep, text)
        assert out[doc_id]["n_removed"] == 0
        assert out[doc_id]["n_lines"] == len(text.split(sep))


def _py_weighted_median(vals, weights):
    order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
    tot = sum(weights)
    cum = 0.0
    for i in order:
        cum += weights[i]
        if 2 * cum >= tot:
            return vals[i]
    return vals[order[-1]]


@SETTINGS
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=100),   # price (int -> exact)
            st.integers(min_value=1, max_value=20),    # weight
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_matches_python_reference(spark, data):
    """x114's pick-first-past-half-weight rule == the sequential
    definition, for any weights including heavy ties."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [
        (i, float(p), float(wt)) for i, (p, wt) in enumerate(data)
    ]
    df = spark.createDataFrame(rows, "rid long, price double, w double")
    qd = F.col("w").cast("decimal(18,4)")
    wp = W.partitionBy()
    wo = wp.orderBy("price", "rid")
    cum = F.sum(qd).over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
    total = F.sum(qd).over(wp)
    hit = (
        df.select("rid", "price", cum.alias("cw"), total.alias("tw"))
        .filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .orderBy("price", "rid")
        .limit(1)
        .collect()[0]
    )
    vals = [float(p) for p, _ in data]
    weights = [float(wt) for _, wt in data]
    assert hit["price"] == _py_weighted_median(vals, weights)


def _py_gini(counts):
    xs = sorted(counts)
    n = len(xs)
    s = sum(xs)
    t = sum((i + 1) * x for i, x in enumerate(xs))
    return 2 * t / (n * s) - (n + 1) / n


@SETTINGS
@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=1000), min_size=2, max_size=50
    )
)
def test_gini_matches_python_reference(spark, counts):
    """x115's windowed rank formulation == the textbook sorted-list Gini;
    0 for uniform, < 1 - 1/n always."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "uid long, c long"
    )
    i = F.row_number().over(W.partitionBy().orderBy("c", "uid"))
    ranked = df.select("c", i.alias("i"))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("i") * F.col("c")).cast("decimal(38,0)")).alias("t"),
    ).collect()[0]
    n, s, t = agg["n"], float(agg["s"]), float(agg["t"])
    got = 2 * t / (n * s) - (n + 1) / n
    expected = _py_gini(counts)
    assert abs(got - expected) < 1e-9
    assert -1e-9 <= got < 1 - 1 / n + 1e-9


@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters=" \t\n"),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=30,
    ),
    n_merges=st.integers(min_value=0, max_value=20),
)
@settings(max_examples=60, deadline=None)
def test_bpe_segmentation_lossless_property(words, n_merges):
    """Pure-Python property (no Spark): for ANY corpus (unicode, chars
    never seen at fit time) and any merge count, segment_word produces a
    partition whose concatenation is exactly word + EOW, every piece is
    non-empty, and fitting is deterministic across a re-run."""
    from collections import Counter

    from azure_serverless_etl_pipeline_spark.operators.bpe import (
        EOW,
        _merge_all,
        segment_word,
    )
    from tests.test_bpe import naive_fit

    wc = dict(Counter(words))
    merges, _ = naive_fit(wc, n_merges, vocab_cap=10_000)
    merges2, _ = naive_fit(wc, n_merges, vocab_cap=10_000)
    assert merges == merges2
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for w in set(words) | {"never-seen-at-fit-time", "ü🙂x"}:
        pieces = segment_word(w, ranks)
        assert all(pieces)
        assert "".join(pieces) == w + EOW
    # _merge_all never drops or reorders symbols
    assert _merge_all(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    assert _merge_all(["a", "a", "a"], "a", "a") == ["aa", "a"]
