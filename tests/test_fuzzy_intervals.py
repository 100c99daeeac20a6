"""Semantics tests for the round-4 operators: blocked fuzzy join
(operators/fuzzy), binned interval-overlap join (operators/intervals),
DSIR importance reweighting (operators/dsir), and histogram drift
(operators/drift). Oracle parity at sf0.001 is covered by
test_queries_oracle; these pin the algorithmic invariants the SQL twin
cannot express (exactness vs brute force, bin-edge behavior, model
direction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- fuzzy join -----------------------------------------------------------

def _brute_lev_pairs(rows, max_dist, key_len=64):
    import re

    def key(t):
        return re.sub(r"\s+", " ", t.strip().lower())[:key_len]

    def lev(a, b):
        if abs(len(a) - len(b)) > max_dist * 4:  # speed guard only
            pass
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    keyed = [(i, key(t)) for i, t in rows]
    for x in range(len(keyed)):
        for y in range(x + 1, len(keyed)):
            (ia, ka), (ib, kb) = keyed[x], keyed[y]
            a, b = min(ia, ib), max(ia, ib)
            d = lev(ka, kb) if ia < ib else lev(kb, ka)
            if d <= max_dist:
                out.add((a, b, d))
    return out


FUZZY_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bonk"),  # 1 sub
    (3, "the quick brown fox jumped over the lazy dog near the river ba"),  # insert+subs
    (4, "a completely different document about spark physical planning"),
    (5, "a completely different document about spark logical planning"),  # 4 subs > d
    (6, "tiny doc"),          # short-key block
    (7, "tiny dog"),          # short, dist 1 from 6
    (8, "tiny documents"),    # short-ish, tests short x short boundary
    (9, "x" * 30),
    (10, "x" * 30 + "yy"),    # dist 2, repeated-gram multiset case
    (11, ""),                 # empty key
    (12, " "),                # whitespace-only -> empty key
]


def test_fuzzy_pairs_exact_vs_bruteforce(spark):
    from azure_serverless_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(FUZZY_ROWS, "doc_id long, text string")
    got = {
        (r.a, r.b, r.dist)
        for r in fuzzy_pairs(df, max_dist=3, q=5, key_len=64).collect()
    }
    want = _brute_lev_pairs(FUZZY_ROWS, max_dist=3)
    assert got == want
    # sanity: the designed positives/negatives landed
    assert (1, 2, 1) in got
    assert (6, 7, 1) in got
    assert (9, 10, 2) in got
    assert not any(a == 4 and b == 5 for a, b, _ in got) or (4, 5, 4) not in got


def test_fuzzy_pairs_no_duplicate_pairs(spark):
    from azure_serverless_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(FUZZY_ROWS, "doc_id long, text string")
    out = fuzzy_pairs(df, max_dist=3, q=5, key_len=64)
    n = out.count()
    assert out.select("a", "b").distinct().count() == n


# --- interval overlap -----------------------------------------------------

US = 1_000_000


def _iv(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, session_id long, start_us long, end_us long"
    )


def test_interval_overlap_exact_pairs(spark):
    from azure_serverless_etl_pipeline_spark.operators.intervals import (
        interval_overlap_pairs,
    )

    h = 3600 * US
    rows = [
        (1, 1, 0 * h, 2 * h),          # overlaps (2,1) and (3,1)
        (2, 1, 1 * h, 3 * h),          # overlaps (1,1), (3,1)
        (3, 1, int(1.5 * h), int(1.7 * h)),  # nested inside both
        (4, 1, 2 * h, 3 * h),          # a.end == b.start: half-open, NO overlap w/ (1,1)
        (5, 1, 10 * h, 11 * h),        # isolated
        (6, 1, 0, 30 * 24 * h),        # month-long interval spanning many bins
    ]
    out = interval_overlap_pairs(_iv(spark, rows), bin_minutes=60)
    got = {((r.a_user_id, r.a_session_id), (r.b_user_id, r.b_session_id)) for r in out.collect()}
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[2] < b[3] and b[2] < a[3]:
                want.add(((a[0], a[1]), (b[0], b[1])))
    assert got == want
    assert (((1, 1), (4, 1)) not in got)  # half-open edge respected
    # the long interval pairs with everything but the isolated one... check dup-free
    assert len(got) == len(list(got))
    assert out.count() == len(want)  # each pair exactly once despite shared bins


def test_session_concurrency_matches_naive(spark):
    from azure_serverless_etl_pipeline_spark.operators.intervals import (
        session_concurrency,
        sessions_with_timeout,
    )
    from azure_serverless_etl_pipeline_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    out = session_concurrency(ev).collect()
    sess = sessions_with_timeout(ev).collect()
    naive = {}
    for s in sess:
        c = sum(
            1
            for t in sess
            if (t.user_id, t.session_id) != (s.user_id, s.session_id)
            and s.start_us < t.end_us
            and t.start_us < s.end_us
        )
        naive[(s.user_id, s.session_id)] = c
    assert len(out) == len(sess)
    for r in out:
        assert r.n_concurrent == naive[(r.user_id, r.session_id)], (
            r.user_id,
            r.session_id,
        )


# --- DSIR importance ------------------------------------------------------

def test_dsir_target_docs_score_higher(spark):
    from azure_serverless_etl_pipeline_spark.operators import dsir

    rows = [(i, "alpha beta gamma delta " * 5, "en") for i in range(20)] + [
        (100 + i, "uno dos tres cuatro " * 5, "es") for i in range(20)
    ] + [(999, "", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    scores = dsir.importance_scores(
        df, df.filter(F.col("lang") == "en"), n_buckets=101
    )
    got = {r.doc_id: (r.n_tokens, r.importance) for r in scores.collect()}
    assert len(got) == 41
    assert got[999] == (0, 0.0)  # zero-token doc present, scores 0
    en = [got[i][1] for i in range(20)]
    es = [got[100 + i][1] for i in range(20)]
    assert min(en) > max(es)  # target-like docs strictly outrank


def test_dsir_select_top_fraction_deterministic(spark):
    from azure_serverless_etl_pipeline_spark.operators import dsir

    rows = [(i, f"tok{i % 7} common word", "en" if i % 2 else "de") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    scores = dsir.importance_scores(df, df.filter(F.col("lang") == "en"), n_buckets=53)
    top = dsir.select_top_fraction(scores, 0.25)
    ids1 = sorted(r.doc_id for r in top.collect())
    ids2 = sorted(r.doc_id for r in dsir.select_top_fraction(scores, 0.25).collect())
    assert ids1 == ids2
    assert len(ids1) == 10


# --- histogram drift ------------------------------------------------------

def test_drift_identical_and_disjoint_slices(spark):
    from azure_serverless_etl_pipeline_spark.operators.drift import histogram_drift

    # two slices with the SAME histogram -> tv 0 for both; one disjoint
    rows = (
        [(i, "a", 10) for i in range(50)] + [(i, "a", 120) for i in range(50)]
        + [(1000 + i, "b", 10) for i in range(50)] + [(1000 + i, "b", 120) for i in range(50)]
        + [(2000 + i, "c", 900) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r.source: r for r in histogram_drift(df).collect()}
    assert out["a"].n_rows == 100 and out["c"].n_rows == 100
    # a and b each: p_slice = (.5, .5, 0) vs global (1/3, 1/3, 1/3)
    assert out["a"].tv_distance == pytest.approx(1 / 3, abs=1e-9)
    assert out["b"].tv_distance == pytest.approx(1 / 3, abs=1e-9)
    # c: (0, 0, 1) vs global -> tv = 2/3
    assert out["c"].tv_distance == pytest.approx(2 / 3, abs=1e-9)
    for r in out.values():
        assert 0.0 <= r.tv_distance <= 1.0


# --- bitext margin mining -------------------------------------------------

def test_margin_topk_match_semantics(spark):
    from azure_serverless_etl_pipeline_spark.operators.similarity import (
        margin_topk_match,
    )

    # source 1 has a near-identical target (10) and unrelated others ->
    # high margin; source 2 is equidistant from everything -> margin ~1
    src = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.5, 0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [
            (10, [0.99, 0.05, 0.0]),
            (11, [0.0, 1.0, 0.0]),
            (12, [0.0, 0.0, 1.0]),
            (13, [0.0, 0.7, 0.7]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.src_id: r for r in margin_topk_match(src, tgt, k=3).collect()}
    assert out[1].tgt_id == 10 and out[1].margin > 1.5
    assert out[2].margin < 1.3
    assert abs(out[1].cos_sim - 0.99 / (0.99**2 + 0.05**2) ** 0.5) < 1e-6


def test_margin_every_source_matched_once(spark):
    from azure_serverless_etl_pipeline_spark.operators.similarity import (
        margin_topk_match,
    )
    from azure_serverless_etl_pipeline_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    src = emb.filter(F.col("vec_id") < 20)
    tgt = emb.filter(F.col("vec_id") >= 20)
    out = margin_topk_match(src, tgt, k=4).collect()
    assert len(out) == 20
    assert len({r.src_id for r in out}) == 20
    for r in out:
        assert r.margin >= 1.0  # best >= mean of top-k by construction


# --- containment join -----------------------------------------------------

def test_containment_catches_subset_jaccard_misses(spark):
    from azure_serverless_etl_pipeline_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally unrelated words only here")],
        "doc_id long, text string",
    )
    cont = {(r.id_a, r.id_b): r.containment for r in containment_pairs(df, 0.9).collect()}
    assert cont == {(1, 2): 1.0}  # small fully inside big
    jac = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert not any(r.id_a == 1 and r.id_b == 2 for r in jac)  # jaccard misses it


def test_containment_capped_matches_uncapped(spark):
    from azure_serverless_etl_pipeline_spark.operators.dedup import containment_pairs
    from azure_serverless_etl_pipeline_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {
        (r.id_a, r.id_b, r.containment)
        for r in containment_pairs(docs, threshold=0.4).collect()
    }
    # generous cap: nothing is actually dropped -> bit-identical output
    capped = {
        (r.id_a, r.id_b, r.containment)
        for r in containment_pairs(docs, threshold=0.4, max_shingle_freq=10**6).collect()
    }
    assert exact == capped
    # tight cap: sound upper bound means NO missing high-containment pair
    # unless every shared shingle was ubiquitous; on this data assert the
    # capped result is a subset with identical scores where present
    tight = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(docs, threshold=0.4, max_shingle_freq=5).collect()
    }
    exact_d = {(a, b): c for a, b, c in exact}
    for k, v in tight.items():
        assert exact_d[k] == v


# --- event funnel ---------------------------------------------------------

def test_funnel_first_qualifying_semantics(spark):
    from azure_serverless_etl_pipeline_spark.operators.funnel import (
        funnel_summary,
        funnel_times,
    )
    import datetime as dt

    T0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: full funnel in order
        (1, "signup", T0), (1, "click", T0 + h), (1, "purchase", T0 + 2 * h),
        # user 2: click BEFORE signup (must not count), no purchase
        (2, "click", T0), (2, "signup", T0 + h),
        # user 3: signup only
        (3, "signup", T0),
        # user 4: purchase before click (purchase after signup but before
        # the qualifying click -> step 3 NOT reached)
        (4, "signup", T0), (4, "purchase", T0 + h), (4, "click", T0 + 2 * h),
        # user 5: never signed up -> not in funnel at all
        (5, "click", T0), (5, "purchase", T0 + h),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    times = {r.user_id: r for r in funnel_times(ev, ["signup", "click", "purchase"]).collect()}
    assert set(times) == {1, 2, 3, 4}
    assert times[1].t3 is not None
    assert times[2].t2 is None  # pre-signup click ignored
    assert times[4].t2 is not None and times[4].t3 is None
    out = {r.step: r for r in funnel_summary(ev, ["signup", "click", "purchase"]).collect()}
    assert out["signup"].n_users == 4
    assert out["click"].n_users == 2   # users 1 and 4
    assert out["purchase"].n_users == 1  # user 1 only
    assert out["signup"].avg_hours_from_prev is None
    assert abs(out["purchase"].avg_hours_from_prev - 1.0) < 1e-9


# --- pagerank -------------------------------------------------------------

def test_pagerank_fixed_point_matches_reference(spark):
    from azure_serverless_etl_pipeline_spark.operators.graph import pagerank, SCALE

    # star graph: hub 1 connected to 2,3,4; plus isolated pair 5-6
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (5, 6)], "id_a long, id_b long"
    )
    out = {r.node: r.pagerank for r in pagerank(pairs, 85, 10).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # hub dominates its satellites; symmetric pair equal
    assert out[1] > out[2] == out[3] == out[4]
    assert out[5] == out[6]

    # pure-python reference with the IDENTICAL fixed-point rules
    edges = {1: [2, 3, 4], 2: [1], 3: [1], 4: [1], 5: [6], 6: [5]}
    outdeg = {k: len(v) for k, v in edges.items()}
    n = 6
    r = {v: SCALE // n for v in edges}
    for _ in range(10):
        contrib = {v: 0 for v in edges}
        for u, vs in edges.items():
            for v in vs:
                contrib[v] += r[u] // outdeg[u]
        r = {v: 15 * SCALE // 100 // n + (85 * c) // 100 for v, c in contrib.items()}
    for v in edges:
        assert out[v] == r[v] / SCALE, v


# --- contrastive triplets -------------------------------------------------

def test_contrastive_triplets_invariants(spark):
    from azure_serverless_etl_pipeline_spark.operators import contrastive, dedup
    from azure_serverless_etl_pipeline_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    pairs = dedup.embedding_near_dup(emb, threshold=0.25, block_col="label")
    out = contrastive.mine_triplets(pairs, emb).collect()
    n_pairs = pairs.count()
    assert 0 < len(out) <= n_pairs
    valid_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    cells = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in out:
        # negative is a real corpus member, same cell (HARD), never
        # anchor/positive
        assert r.negative in valid_ids
        assert r.negative != r.anchor and r.negative != r.positive
        assert cells[r.negative] == r.cell == cells[r.anchor]
    # deterministic: second run bit-identical
    again = contrastive.mine_triplets(pairs, emb).collect()
    key = lambda r: (r.anchor, r.positive, r.negative, r.cos_pos, r.cos_neg)
    assert sorted(map(key, out)) == sorted(map(key, again))
