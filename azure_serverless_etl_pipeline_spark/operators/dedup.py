"""Deduplication operators for LLM-training-data pipelines.

Not present in the reference (its dedup story is Cosmos upsert-by-id,
``blob_to_cosmosdb.py:34``); mandated by the north star. Five strategies,
all expressed as distributed DataFrame plans — no driver-side loops:

- exact          : hash group-by on the full text (one shuffle)
- n-gram Jaccard : shingle -> inverted-index self-join -> exact Jaccard
- MinHash + LSH  : shingle -> minhash signature (map-side) -> banded
                   bucket join -> verify exact Jaccard on candidates
- SimHash        : 64-bit signature (map-side array fold) -> pigeonhole
                   block join -> verify Hamming distance
- embedding      : cosine over array<float> within coarse blocks

Scale notes (100 TB):
- Signatures (minhash/simhash) are computed map-side with array
  expressions — zero shuffles until the candidate join, whose input is
  |docs| * n_bands tiny rows, not |docs|^2.
- Candidate pruning follows the published similarity-join literature
  (prefix filtering a la PPJoin; cf. PAPERS.md: compressed-index string
  similarity join, ICDE 2022; top-k similarity search, EDBT 2020).
- The inverted-index Jaccard join is quadratic in per-shingle frequency;
  ``max_shingle_freq`` drops ubiquitous shingles (stop-shingles), the
  standard guard against join skew at scale.
- Verification joins re-fetch only candidate pairs (semi-join pattern).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import dot, tokens, word_shingles

# Fixed seed for all signature hashing: deterministic across runs/engines.
_SEED = 42


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Representative (min id) per distinct text + multiplicity.

    One hash-aggregate shuffle; at scale, group on ``xxhash64(text)`` first
    to shuffle 8-byte keys instead of full documents, then resolve rare
    hash collisions within groups — here text itself is the key for
    oracle-exactness.
    """
    return df.groupBy(text_col).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies")
    )


def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) inverted index — distinct word n-grams per doc.

    Explodes through ``explode_outer`` + isNotNull so the shingle chain
    is evaluated once per row (see ``_explode_shingles``); docs with no
    shingles contribute no rows either way (the outer null row is
    filtered, matching the plain explode's drop)."""
    return df.select(
        F.col(id_col),
        F.explode_outer(word_shingles(F.col(text_col), n)).alias("shingle"),
    ).filter(F.col("shingle").isNotNull())


def _verify_jaccard(
    cand: DataFrame, base: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs: re-fetch
    the two shingle arrays and intersect — the semi-join verify pattern
    shared by the prefix/capped/minhash candidate generators.

    The union size is DERIVED, not computed: every ``shingles`` array this
    sees is distinct-by-construction (``word_shingles`` ends in
    ``array_distinct``; persisted bases roundtrip that output), so
    |A ∪ B| == |A| + |B| − |A ∩ B| over the same integers — the division
    sees identical operands and the jaccard value is bit-identical, while
    the per-row interpreted ``ArrayUnion`` hash-set build (the measured
    hot spot of the verify task — a thread dump showed it at ~75% of the
    stage) is gone entirely."""
    sa = base.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = base.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            n_inter / (F.size("sh_a") + F.size("sh_b") - n_inter),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _shingle_base(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, shingles) projection with empty-shingle docs dropped — the
    shared base of every shingle-driven generator.

    The emptiness filter runs on the TOKEN COUNT *before* the projection:
    writing ``.filter(size(shingles) > 0)`` after the select makes
    Catalyst push the predicate below the project by substituting the
    alias, so the whole zip_with shingle pipeline — interpreted
    higher-order functions, the heaviest per-row expression in the dedup
    family, never shared across operators by codegen CSE — is evaluated
    TWICE per document (once in the pushed filter, once in the
    projection; visible as the duplicated expression in Filter/Project
    pairs of the round-13 before-plans). A doc has a non-empty shingle
    array iff it has >= n non-empty tokens (each gram needs n consecutive
    tokens; array_compact drops the null-padded tail, array_distinct of a
    non-empty array is non-empty), and the token-count predicate costs
    one split+filter instead of the full chain."""
    c = F.col(text_col)
    return df.filter(F.size(tokens(c)) >= n).select(
        F.col(id_col), word_shingles(c, n).alias("shingles")
    )


def _explode_shingles(base: DataFrame, id_col: str) -> DataFrame:
    """(id, shingle) posting stream off a shingle base with the chain
    evaluated ONCE per document (r14, guide §4.4 — stop the optimizer
    duplicating the expensive expression).

    A plain ``explode`` carries the generator constraints "array is
    non-null and non-empty", and InferFiltersFromConstraints re-derives
    them as a Filter below the projection by alias substitution — so the
    interpreted zip_with shingle chain (the heaviest per-row expression
    in the dedup family, never shared by codegen CSE) was evaluated
    THREE times per document: twice in the inferred filter's size()/
    isnotnull() conjuncts, once in the projection (the r13 residual —
    VERDICT r13 item 3; the round-13 ``_shingle_base`` token-count
    filter removed the *user* filter's copy but not the inferred one).
    ``explode_outer`` carries no such constraints, so nothing is
    inferred; the null row an empty array would emit cannot occur
    (``_shingle_base`` pre-filters ``size(tokens) >= n`` and shingle
    elements are non-null by construction), and the belt-and-braces
    isNotNull on the OUTPUT column cannot be pushed below the generate.
    Verified: identical rows, plan chain count 3 -> 1."""
    return base.select(
        F.col(id_col), F.explode_outer("shingles").alias("shingle")
    ).filter(F.col("shingle").isNotNull())


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    method: str = "inverted",
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard >= threshold.

    ``max_shingle_freq`` — the stop-shingle skew guard: shingles whose
    document frequency exceeds the cap are dropped from CANDIDATE
    GENERATION only (every surviving pair is still verified with exact
    Jaccard over the FULL shingle sets, so no false positives and no
    distorted scores). Without the cap, a boilerplate shingle shared by f
    docs contributes O(f²) rows to the self-join — at corpus scale a
    single 10⁶-doc shingle means 10¹² candidate pairs. The recall caveat
    is narrow: only a pair whose ENTIRE shared-shingle set is ubiquitous
    (every common shingle above the cap) can be missed — and two docs
    sharing nothing but boilerplate are precisely the pairs a dedup
    pipeline should not link. Unset (None) keeps the exact all-pairs
    semantics for the oracle.

    method="inverted": inverted-index self-join + pair-count — the shingle
    table is computed once and cached (it feeds both join sides and the
    size table; recomputing the regex/array pipeline 3x dominates runtime
    otherwise). Intersection sizes come from the pair group-by, so no
    per-pair array ops. With ``max_shingle_freq`` set, the pair-count
    shortcut is invalid (dropped shingles would undercount n_common), so
    candidates switch to the exact-verify path instead.

    method="prefix": PPJoin-style prefix filter — join only on each doc's
    ``|S| - ceil(t*|S|) + 1`` globally-rarest shingles (zero false
    negatives when uncapped), then verify candidates by array
    intersection. Strictly better when shingle frequencies are skewed
    (real corpora: stop-phrase shingles with million-row posting lists);
    on uniform-frequency data the prune rate is ~0 and "inverted" wins.
    The cap composes: prefix shingles above it are dropped before the
    self-join.
    """
    base = _shingle_base(df, text_col, id_col, n)
    sh = _explode_shingles(base, id_col).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    if method == "prefix":
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        ranked = sh.join(freq, "shingle").withColumn(
            "pos", F.row_number().over(W.partitionBy(id_col).orderBy("df", "shingle"))
        )
        join_input = ranked.join(sizes, id_col).filter(
            F.col("pos") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        )
        if max_shingle_freq is not None:
            join_input = join_input.filter(F.col("df") <= max_shingle_freq)
        join_input = join_input.select(id_col, "shingle")
        a, b = join_input.alias("a"), join_input.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        out = _verify_jaccard(cand, base, id_col, threshold)
        out._owned_caches = [sh]  # type: ignore[attr-defined]
        return out

    if max_shingle_freq is not None:
        # capped inverted index: bound every posting list, pair-count the
        # surviving postings (same cheap count-aggregate join as the exact
        # path — per-pair rows never carry arrays), then prune with a SOUND
        # Jaccard upper bound before the array verify:
        #   true_common <= n_cc + min(dropped_a, dropped_b)
        # (shared shingles are shared-capped or shared-dropped, and
        # shared-dropped <= either side's dropped count). Only pairs whose
        # upper bound clears the threshold reach the array intersect — on
        # unskewed data (nothing dropped) the bound IS the exact Jaccard
        # and the verify set equals the output set.
        # df via a window over the SELF-JOIN KEY (shingle): the one shuffle
        # that computes posting-list lengths leaves the data partitioned
        # exactly how the candidate join needs it (exchange reuse) — a
        # groupBy+join formulation pays two extra shuffles for the same
        # information. sz and csz then come from ONE id-keyed aggregation.
        tagged = (
            sh.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
            .withColumn("keep", F.col("df") <= max_shingle_freq)
            .cache()
        )
        drops = tagged.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("sz"),
            (F.count(F.lit(1)) - F.sum(F.col("keep").cast("long"))).alias("dropped"),
        )
        capped = tagged.filter(F.col("keep")).select(id_col, "shingle")
        a, b = capped.alias("a"), capped.alias("b")
        inter_c = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .agg(F.count(F.lit(1)).alias("n_cc"))
        )
        da = drops.select(
            F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"),
            F.col("dropped").alias("drop_a"),
        )
        db = drops.select(
            F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"),
            F.col("dropped").alias("drop_b"),
        )
        ub_common = F.col("n_cc") + F.least(F.col("drop_a"), F.col("drop_b"))
        cand = (
            inter_c.join(da, "id_a")
            .join(db, "id_b")
            .filter(
                ub_common / (F.col("sz_a") + F.col("sz_b") - ub_common)
                >= threshold
            )
            .select("id_a", "id_b")
        )
        out = _verify_jaccard(cand, base, id_col, threshold)
        out._owned_caches = [sh, tagged]  # type: ignore[attr-defined]
        return out

    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    # sizes scales with |docs| — no broadcast hint; AQE picks BHJ when the
    # runtime size is under the threshold, SMJ at real scale
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    out._owned_caches = [sh]  # type: ignore[attr-defined]
    return out


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs with shingle CONTAINMENT >= threshold.

    Containment = |A cap B| / min(|A|, |B|) — the asymmetric overlap
    measure that catches a small document quoted/embedded inside a big
    one, which symmetric Jaccard structurally misses (a 50-shingle doc
    fully contained in a 5000-shingle doc has Jaccard 0.01 but
    containment 1.0). Standard companion to Jaccard dedup in corpus
    pipelines: boilerplate pages, quote-expansions, and partial scrapes
    are containment relations, not near-equality.

    Same inverted-index pair-count plan as ngram_jaccard_pairs (the
    shingle table is computed once and cached; intersection sizes come
    from the pair group-by — per-pair rows never carry arrays). With
    ``max_shingle_freq`` set, frequent shingles are dropped from
    candidate generation only and survivors are pruned with the SOUND
    upper bound true_common <= n_cc + min(dropped_a, dropped_b) before
    an exact array-intersect verify — identical cap semantics and recall
    caveat as the Jaccard operator (dedup.py:96).
    """
    base = _shingle_base(df, text_col, id_col, n)
    sh = _explode_shingles(base, id_col).cache()

    if max_shingle_freq is not None:
        tagged = (
            sh.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
            .withColumn("keep", F.col("df") <= max_shingle_freq)
        )
        drops = tagged.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("sz"),
            (F.count(F.lit(1)) - F.sum(F.col("keep").cast("long"))).alias("dropped"),
        )
        capped = tagged.filter(F.col("keep")).select(id_col, "shingle")
        a, b = capped.alias("a"), capped.alias("b")
        inter_c = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .agg(F.count(F.lit(1)).alias("n_cc"))
        )
        da = drops.select(
            F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"),
            F.col("dropped").alias("drop_a"),
        )
        db = drops.select(
            F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"),
            F.col("dropped").alias("drop_b"),
        )
        ub = F.col("n_cc") + F.least(F.col("drop_a"), F.col("drop_b"))
        cand = (
            inter_c.join(da, "id_a")
            .join(db, "id_b")
            .filter(ub / F.least(F.col("sz_a"), F.col("sz_b")) >= threshold)
            .select("id_a", "id_b")
        )
        sa2 = base.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
        sb2 = base.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
        return (
            cand.join(sa2, "id_a")
            .join(sb2, "id_b")
            .withColumn(
                "containment",
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.least(F.size("sh_a"), F.size("sh_b")),
            )
            .filter(F.col("containment") >= threshold)
            .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
        )

    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "containment",
            F.col("n_common") / F.least(F.col("sz_a"), F.col("sz_b")),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    rows_per_band = num_perm // bands; with 64 perms / 32 bands (r=2),
    candidate recall at J=0.5 is 1-(1-0.25)^32 ~ 0.9999. Candidates are
    then verified exactly, so precision is 1.0 by construction; output is
    LSH-recall-limited (hence no SQL oracle — driver does rows-only).

    ``max_bucket_size`` is the mega-bucket guard — the banding
    counterpart of ``ngram_jaccard_pairs``' stop-shingle cap. A
    boilerplate/template family (thousands of documents sharing header
    shingles) collapses into one (band, bucket) and the candidate
    self-join emits |bucket|^2/2 pairs PER BAND for it: measured on a
    10x slice with a planted canonical-ordering pathology, unguarded
    banding blew 822x in shuffle bytes (SCALE.md round-6). Buckets
    above the cap are dropped before the join (a tiny per-bucket count
    + broadcast anti-join); recall is lost ONLY for pairs whose every
    colliding band is a mega-bucket — i.e. giant boilerplate families,
    exactly the population exact/whole-doc dedup already handles and
    the one you never want pair-expanded at 100 TB.

    Signature layout: explode shingles once, hash each shingle STRING
    exactly once (string hashing is length-proportional and dominated the
    round-1 profile at num_perm hashes per shingle), derive the num_perm
    family members as xxhash64 over the resulting 8-byte long — flat
    columns inside whole-stage codegen — then one partial-aggregated
    groupBy with num_perm min()s. A/B-measured alternatives both lose: a
    nested transform/array_min map-side formulation allocates num_perm
    arrays per document (~1.5x slower end-to-end despite zero signature
    shuffle), and the map-side combine keeps the exchange tiny
    (|docs|-bounded partial rows, not |shingles|).
    """
    r = num_perm // bands
    base = _shingle_base(df, text_col, id_col, n)
    ex = _explode_shingles(base, id_col)
    one_hash = ex.select(
        id_col, F.xxhash64(F.lit(_SEED), F.col("shingle")).alias("h")
    )
    hashed = one_hash.select(
        id_col,
        *[F.xxhash64(F.lit(i), F.col("h")).alias(f"h{i}") for i in range(num_perm)],
    )
    sig = hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_perm)]
    )

    # band bucket = xxhash64 over the band's signature columns (variadic —
    # no array allocation); only (id, band, bucket) enters the join.
    # Cached: it feeds BOTH sides of the candidate self-join, and the
    # map-side signature pipeline has no Exchange for Spark to reuse —
    # uncached, the whole shingle+hash pipeline would run twice.
    banded = (
        sig.select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.xxhash64(
                                *[F.col(f"m{bi * r + j}") for j in range(r)]
                            ).alias("bucket"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("bb"),
        )
        .select(id_col, "bb.band", "bb.bucket")
        .cache()
    )
    if max_bucket_size is not None:
        big = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") > max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(F.broadcast(big), ["band", "bucket"], "left_anti")

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # verification re-fetches shingle arrays for the (few) candidates only
    return _verify_jaccard(cand, base, id_col, threshold)


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Pigeonhole blocking: split the signature into ``blocks`` chunks; any
    pair within distance < blocks must agree on >= 1 full chunk, so the
    candidate join is an equi-join on (block_id, chunk_value). Verified
    by exact Hamming on the full signature.

    Bit votes are computed like the minhash signature: explode tokens,
    emit ``bits`` flat +-1 columns per token (bit i of the token hash),
    and sum them in one partial-aggregated groupBy — flat columns stay in
    whole-stage codegen, unlike a per-token array fold.
    """
    chunk = bits // blocks
    # bit 63's mask is the sign bit, which only fits a signed long as the
    # negative two's-complement value
    masks = [(1 << i) if i < 63 else -(1 << 63) for i in range(bits)]
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    ex = base.select(F.col(id_col), F.explode("toks").alias("tok"))
    h = F.xxhash64(F.lit(_SEED), F.col("tok"))
    votes = ex.select(
        id_col,
        *[
            F.when(h.bitwiseAND(F.lit(m)) != 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias(f"b{i}")
            for i, m in enumerate(masks)
        ],
    )
    agg = votes.groupBy(id_col).agg(
        *[F.sum(f"b{i}").alias(f"v{i}") for i in range(bits)]
    )
    # pack the signature into `blocks` longs (one per pigeonhole chunk):
    # equality joins on a long, and Hamming = sum of bit_count(xor) —
    # no per-pair array materialization
    sig = agg.select(
        id_col,
        *[
            sum(
                (
                    F.when(F.col(f"v{bi * chunk + j}") > 0, F.lit(1 << j)).otherwise(
                        F.lit(0)
                    )
                    for j in range(chunk)
                ),
                start=F.lit(0),
            )
            .cast("long")
            .alias(f"c{bi}")
            for bi in range(blocks)
        ],
    )
    blocked = sig.select(
        id_col,
        *[F.col(f"c{bi}") for bi in range(blocks)],
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bi).alias("blk"), F.col(f"c{bi}").alias("chunk"))
                    for bi in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select(id_col, *[f"c{bi}" for bi in range(blocks)], "bb.blk", "bb.chunk")
    a, b = blocked.alias("a"), blocked.alias("b")
    hamming = sum(
        (
            F.bit_count(F.col(f"a.c{bi}").bitwiseXOR(F.col(f"b.c{bi}")))
            for bi in range(blocks)
        ),
        start=F.lit(0),
    )
    cand = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        hamming.cast("int").alias("hamming"),
    )
    return (
        cand.filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


def dup_clusters(
    pairs: DataFrame,
    max_iter: int = 20,
) -> DataFrame:
    """Resolve near-dup PAIRS into transitive CLUSTERS: (doc_id, cluster_id)
    where cluster_id is the min doc id reachable through any chain of
    pairs. Pairwise dedup alone under-deletes (a~b, b~c but a!~c leaves
    both b and c unless chains collapse).

    Iterative min-label propagation (the standard connected-components
    loop on Spark): each round joins every node's current label with its
    neighbors' and keeps the min; converges in O(log n) rounds for real
    dup-cluster shapes (chains are short). Each round is one shuffle on
    a frame of |nodes| rows; the edge list is re-used via cache.
    """
    # No .distinct() on edges: min-aggregation is duplicate-insensitive,
    # and deduping here costs a full shuffle of the edge list before the
    # loop even starts (pair generators emit id_a < id_b unique anyway).
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .cache()
    )
    # Round 1 fused with initialization (r14, guide §5/§2.4): with
    # identity starting labels, one round of min-label propagation is
    # simply min(self, min over neighbors) — ONE groupBy over the edge
    # list. The old shape paid a distinct (nodes) + join + aggregate +
    # join for the identical frame, i.e. three extra exchanges inside
    # the loop's first eager job. Every node appears as src (edges are
    # materialized in both directions), so the groupBy key set IS the
    # node set.
    labels = edges.groupBy("src").agg(
        F.least(F.col("src"), F.min("dst")).alias("label")
    ).select(F.col("src").alias("node"), "label")
    labels = labels.localCheckpoint(eager=True)
    changed = labels.filter(F.col("label") != F.col("node")).limit(1).count()
    # A single round handles isolated pairs/stars whose min is a direct
    # neighbor; anything deeper iterates below. changed == 0 here means
    # every node already carries its component min (only possible when
    # there are no edges at all — least(src, min(dst)) < src for every
    # non-min member), so the loop is skipped outright.
    for _ in range(max_iter - 1):
        if changed == 0:
            break
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # Carry the previous label through the round so the fixpoint probe
        # reads the CHECKPOINTED output instead of re-running the
        # join+aggregate (the old shape executed every round's plan twice:
        # once for the changed-count action, once for the eager
        # checkpoint) and needs no extra old-vs-new join.
        stepped = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # Pointer doubling (r14, guide §5: fewer driver-sequenced eager
        # rounds): follow the stepped label one more hop through the
        # PREVIOUS round's checkpointed map — label' = min(label,
        # labels[label]). Every label value is a node id of the same
        # component (labels[] maps nodes to reachable ids), so the
        # fixpoint is unchanged, but the distance covered per eager
        # round grows 1, 3, 7, ... (2d+1) instead of 1, 2, 3, ... —
        # O(log diameter) checkpoint+probe cycles instead of
        # O(diameter). One extra hash join on the |nodes|-bounded label
        # frame per round buys each saved round's full eager job.
        hop = labels.select(
            F.col("node").alias("_hn"), F.col("label").alias("_hl")
        )
        updated = (
            stepped.join(hop, stepped.label == hop._hn, "left")
            .select(
                "node",
                "old_label",
                F.least(
                    F.col("label"), F.coalesce(F.col("_hl"), F.col("label"))
                ).alias("label"),
            )
        )
        # localCheckpoint: truncate the lineage so iteration depth doesn't
        # compound the plan (the classic iterative-algorithm pitfall)
        ck = updated.localCheckpoint(eager=True)
        changed = (
            ck.filter(F.col("label") != F.col("old_label")).limit(1).count()
        )
        labels = ck.select("node", "label")
    edges.unpersist()
    if changed != 0:
        # min-label propagation converges in O(component diameter) rounds;
        # exiting early would silently return WRONG cluster labels for any
        # component deeper than max_iter
        raise RuntimeError(
            f"dup_clusters did not converge within max_iter={max_iter} rounds; "
            "a duplicate-chain component has diameter > max_iter — raise max_iter"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def ngram_jaccard_pairs_incremental(
    new_docs: DataFrame,
    old_docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Jaccard near-dup pairs TOUCHING the new batch only: new-vs-new
    plus new-vs-old — the arrival-path complement of the batch
    ``ngram_jaccard_pairs``. A daily ingest must ask "which arriving
    docs duplicate each other or the existing corpus?" without re-pairing
    the corpus against itself: the old-old candidate join (the
    quadratic-in-|corpus| term) never runs here; old shingles only
    appear as the posting-list side of an equi-join against the (small)
    new batch.

    Exact-verified like the batch operator (every candidate re-checked
    against FULL shingle sets), so uncapped output == the touching-new
    subset of the batch operator's output, bit for bit. With
    ``max_shingle_freq``, document frequencies are computed over the
    UNION (matching what a one-shot run over old+new would see), so
    candidate recall is never below the batch run's. Ids must be
    disjoint across the two frames (standard for append-only ingest).

    In a deployment ``old_docs``' shingle index is a materialized
    artifact updated per batch; here it is derived, and the derivation
    is the one extra old-corpus scan (linear, not quadratic).
    """
    new_base = _shingle_base(new_docs, text_col, id_col, n)
    old_base = _shingle_base(old_docs, text_col, id_col, n)
    # keep the cached handle: max_shingle_freq rebinds new_sh below, and
    # the HANDLE is what the _owned_caches handover must release
    cached_new_sh = _explode_shingles(new_base, id_col).cache()
    new_sh = cached_new_sh
    old_sh = _explode_shingles(old_base, id_col)

    if max_shingle_freq is not None:
        # round-13: candidate generation keeps the cap as before, but the
        # raw shared-shingle pairs now pass the one-shot capped path's
        # SOUND Jaccard upper bound before the array verify:
        #   true_common <= n_cc + min(dropped_a, dropped_b)
        # (a shared shingle is shared-capped — counted in n_cc — or
        # over-cap, i.e. dropped on BOTH sides). Only pairs whose bound
        # clears the threshold reach the per-pair array intersect; the
        # 50/50 x117 demo fed ~100k raw candidates to the verify stage,
        # of which a few hundred survive it — the prune removes the
        # hopeless ones with the pair-count aggregate the join already
        # produces. Output is unchanged: the verify still decides
        # membership for every surviving pair.
        # df via a window over the union shingle table — ONE shuffle that
        # also leaves both join sides partitioned by the join key, and
        # per-doc (size, dropped) stats fall out of the same tagged frame.
        u = new_sh.withColumn("__new", F.lit(True)).unionByName(
            old_sh.withColumn("__new", F.lit(False))
        )
        tagged = (
            u.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
            .withColumn("keep", F.col("df") <= max_shingle_freq)
            .cache()
        )
        stats = tagged.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("sz"),
            (F.count(F.lit(1)) - F.sum(F.col("keep").cast("long"))).alias(
                "dropped"
            ),
        )
        new_capped = tagged.filter(F.col("keep") & F.col("__new")).select(
            id_col, "shingle"
        )
        old_capped = tagged.filter(F.col("keep") & ~F.col("__new")).select(
            id_col, "shingle"
        )
        a, b = new_capped.alias("a"), new_capped.alias("b")
        nn = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_cc"))
        )
        o = old_capped.alias("o")
        no = (
            a.join(o, F.col("a.shingle") == F.col("o.shingle"))
            .groupBy(
                F.least(F.col(f"a.{id_col}"), F.col(f"o.{id_col}")).alias(
                    "id_a"
                ),
                F.greatest(F.col(f"a.{id_col}"), F.col(f"o.{id_col}")).alias(
                    "id_b"
                ),
            )
            .agg(F.count(F.lit(1)).alias("n_cc"))
        )
        da = stats.select(
            F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"),
            F.col("dropped").alias("drop_a"),
        )
        db = stats.select(
            F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"),
            F.col("dropped").alias("drop_b"),
        )
        ub_common = F.col("n_cc") + F.least(F.col("drop_a"), F.col("drop_b"))
        # 1e-9 soundness margin: the bound only PRUNES, so comparing a
        # hair below the threshold can never drop a pair the float
        # verify would keep (selectivity is unaffected — real junk
        # candidates miss the threshold by orders of magnitude)
        cand = (
            nn.unionByName(no)
            .join(da, "id_a")
            .join(db, "id_b")
            .filter(
                ub_common / (F.col("sz_a") + F.col("sz_b") - ub_common)
                >= threshold - 1e-9
            )
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        base = new_base.unionByName(old_base)
        out = _verify_jaccard(cand, base, id_col, threshold)
        out._owned_caches = [cached_new_sh, tagged]  # type: ignore[attr-defined]
        return out

    a, b = new_sh.alias("a"), new_sh.alias("b")
    nn = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    o = old_sh.alias("o")
    no = (
        a.join(o, F.col("a.shingle") == F.col("o.shingle"))
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"o.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"o.{id_col}")).alias(
                "id_b"
            ),
        )
    )
    cand = nn.unionByName(no).dropDuplicates(["id_a", "id_b"])
    base = new_base.unionByName(old_base)
    out = _verify_jaccard(cand, base, id_col, threshold)
    # hand the cached batch frame to the consumer (incremental_dup_
    # clusters releases _owned_caches after its eager checkpoint), so a
    # fold through this non-indexed path leaks no CacheManager entry —
    # same contract as ngram_jaccard_pairs_incremental_indexed
    out._owned_caches = [cached_new_sh]  # type: ignore[attr-defined]
    return out


def incremental_dup_clusters(
    old_clusters: DataFrame,
    incremental_pairs: DataFrame,
    max_iter: int = 20,
) -> DataFrame:
    """Fold a new batch's pairs into an existing cluster map WITHOUT
    re-running connected components over the historical pair set.

    Old connectivity is preserved by STAR EDGES — each previously
    clustered doc linked to its cluster label (the label is itself the
    component's min doc id, so stars reproduce exactly the old
    components) — and the new/cross pairs attach arriving docs, possibly
    merging previously separate clusters through a new bridge doc. One
    min-label propagation over |old clustered docs| + |new pairs| edges;
    the historical pair set (quadratically larger than the map on dense
    corpora) is never touched again.

    Output has the same contract as ``dup_clusters``: one (doc_id,
    cluster_id=min reachable id) row per doc that appears in any edge;
    singletons are the caller's coalesce (see canonical_map).

    Propagation runs on the AFFECTED subgraph only: components none of
    whose members touch a new pair cannot change label (min reachable id
    is monotone under edge addition and no new path reaches them), so
    their map rows pass through untouched and the iterative part — the
    O(diameter) rounds of shuffles — runs over |touched components| +
    |new pairs| rows, not the whole historical map. At corpus scale
    that is the difference between per-batch iterations over billions
    of star edges and iterations over the (tiny) frontier the batch
    actually perturbs.

    MATERIALIZATION: the batch-bounded pair frame is eagerly
    localCheckpoint-ed on entry — one execution of the candidate
    generation + verify subplan, whose tiny (id, id) result blocks feed
    the three consuming branches (without this the subplan re-executes
    per branch, measured 2-6x). Caches a pair generator attached to its
    frame via ``_owned_caches`` (see
    ``ngram_jaccard_pairs_incremental_indexed``) are released
    immediately after, so long-lived callers folding many batches in
    one session (the dedup stream, a driver loop) accumulate no cached
    frames — only the checkpoint blocks that back each returned map.
    """
    # ONE execution of the candidate-generation + verify subplan: the
    # pair frame is batch-bounded (two long ids per near-dup pair), so
    # eagerly checkpoint it — a single standalone job whose tiny result
    # blocks then feed every branch below (touched-id derivation, the
    # propagation edge list, the untouched anti-join). A .cache() here
    # is strictly worse: multi-branch jobs over a COLD cache race its
    # per-partition population and re-execute the whole subplan per
    # branch (the r6 shape — in-session A/B medians 12.9s vs 10.3s on
    # x117's fold), it is evictable under session memory pressure, and
    # it leaks a CacheManager entry the caller must clear. The
    # checkpoint also lets the generator's batch-frame caches (handed
    # over via ``_owned_caches``) release immediately, so long-lived
    # callers folding many batches accumulate nothing.
    pairs = incremental_pairs.select("id_a", "id_b").localCheckpoint(
        eager=True
    )
    for owned in getattr(incremental_pairs, "_owned_caches", ()):
        owned.unpersist()
    touched = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    touched_clusters = (
        old_clusters.join(touched, "doc_id").select("cluster_id").distinct()
    )
    affected = old_clusters.join(touched_clusters, "cluster_id")
    stars = affected.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("id_a"), F.col("cluster_id").alias("id_b")
    )
    resolved = dup_clusters(pairs.unionByName(stars), max_iter=max_iter)
    untouched = old_clusters.join(touched_clusters, "cluster_id", "left_anti")
    return untouched.unionByName(resolved)


def materialize_incremental_state(
    old_docs: DataFrame,
    state_dir: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | None = None,
    posting_buckets: int = 64,
) -> None:
    """One-time build of the artifacts an incremental-dedup deployment
    keeps warm between batches, written as parquet under ``state_dir``:

    - ``old_base``    — (id, shingles array) for the existing corpus,
      RANGE-SORTED by id so a per-batch verify re-fetch of candidate
      docs pushes an ``In(id)`` filter into the scan and reads only the
      row groups holding those ids (parquet min/max skipping) instead
      of the whole corpus;
    - ``shingle_df``  — per-shingle document frequency, carried with
      ``shingle_h = xxhash64(shingle)``, bucket-partitioned and sorted
      like the postings below (same pruned lookup);
    - ``postings``    — the INVERTED INDEX (id, shingle, shingle_h),
      partitioned by ``bucket = pmod(shingle_h, posting_buckets)`` and
      sorted by ``shingle_h`` within each bucket. Candidate generation
      for a batch then (a) partition-prunes to the buckets the batch's
      shingles hash into and (b) pushes an ``In(shingle_h)`` filter to
      the parquet scan, so I/O is proportional to the MATCHED posting
      lists, not the standing corpus — the round-8 residual where every
      arriving batch paid a full-corpus posting scan (VERDICT r8 item
      1). Size ``posting_buckets`` so a typical micro-batch's distinct
      shingles under-fill it (directory pruning) — row-group skipping
      covers the large-batch case either way;
    - ``old_map``     — its near-dup cluster map (dup_clusters output).

    Each arriving batch then pays only the incremental tail
    (``ngram_jaccard_pairs_incremental_bucketed`` +
    ``incremental_dup_clusters``): the old corpus is never re-shingled,
    re-paired, re-clustered, or — with the bucketed artifacts — even
    re-SCANNED; the linear old-corpus passes this build performs happen
    once, not per batch. After folding a batch in, a deployment appends
    the batch's rows to these artifacts (same schemas/layout), keeping
    the steady-state cost proportional to batch size.
    """
    base = _shingle_base(old_docs, text_col, id_col, n)
    # range-sort by id: layout-only (same schema) — enables row-group
    # skipping on the bucketed path's In(id) verify re-fetch
    base.repartitionByRange(F.col(id_col)).sortWithinPartitions(
        id_col
    ).write.mode("overwrite").parquet(f"{state_dir}/old_base")
    sh = _explode_shingles(base, id_col)
    write_bucketed_layer(sh, posting_buckets, f"{state_dir}/postings")
    write_bucketed_df(sh, posting_buckets, f"{state_dir}/shingle_df")
    # the reader must hash batch shingles with the WRITER's modulus: pin
    # it in the state itself (a 1-row parquet — engine-portable, same
    # medium as every other artifact)
    old_docs.sparkSession.createDataFrame(
        [(int(posting_buckets),)], "posting_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{state_dir}/meta")
    pairs = ngram_jaccard_pairs(
        old_docs,
        threshold=threshold,
        text_col=text_col,
        id_col=id_col,
        n=n,
        max_shingle_freq=max_shingle_freq,
    )
    old_map = dup_clusters(pairs)
    old_map.write.mode("overwrite").parquet(f"{state_dir}/old_map")
    # every consumer of the pair generator's internal caches has now
    # materialized (dup_clusters is eager, the map is written) — release
    # them so a one-time build leaves no cached frames behind
    for owned in getattr(pairs, "_owned_caches", ()):
        owned.unpersist()


def ngram_jaccard_pairs_incremental_indexed(
    new_docs: DataFrame,
    old_base: DataFrame,
    old_shingle_df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """``ngram_jaccard_pairs_incremental`` reading MATERIALIZED old-corpus
    state instead of re-deriving it: ``old_base`` is the persisted
    (id, shingles) table and ``old_shingle_df`` the persisted per-shingle
    document frequencies (see materialize_incremental_state). Identical
    output — the union document frequency the cap filters on is
    reconstructed as old_df - re-delivered-stale counts + new batch
    counts (the one-shot corpus is (old \\ new) UNION new), so candidate
    recall matches a one-shot run exactly. The only old-corpus
    work per batch is the linear posting-list scan of ``old_base``
    (map-side explode of stored arrays; no shuffle of the old corpus)."""
    # The batch frame is referenced ~7x downstream (shingle join sides,
    # re-delivery anti/semi joins, the verify base): cache it so the
    # regex shingling and the documents scan run ONCE per micro-batch —
    # batch-sized, same caller-clears contract as the pair-frame cache
    # on incremental_dup_clusters.
    new_base = _shingle_base(new_docs, text_col, id_col, n).cache()
    new_sh = _explode_shingles(new_base, id_col).cache()
    # keep a handle on the CACHED frame — `new_sh` is reassigned below
    # when the frequency cap filters it, and the cache handoff must
    # release the original cached entry, not the derived join
    cached_new_sh = new_sh
    # Re-delivered ids (same id in new_docs and old_base): the one-shot
    # corpus is (old \ new) UNION new — the old copy of a re-delivered
    # doc does not exist in it. Its stale postings must leave the
    # candidate side AND its old shingle counts must leave the union df,
    # or shingles near the cap get dropped that a one-shot run keeps
    # (recall loss the "never below one-shot" contract forbids). The
    # anti/semi joins below touch only the (tiny) new-id set.
    new_ids = new_base.select(id_col)
    live_old = old_base.join(new_ids, id_col, "left_anti")
    old_sh = _explode_shingles(live_old, id_col)

    if max_shingle_freq is not None:
        new_cnt = new_sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("ndf"))
        # per-shingle counts of the re-delivered docs' OLD copies,
        # subtracted from the persisted df (which still includes them)
        stale_cnt = (
            old_base.join(new_ids, id_col, "semi")
            .select(F.explode("shingles").alias("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
        )
        freq = (
            old_shingle_df.join(new_cnt, "shingle", "full_outer")
            .join(stale_cnt, "shingle", "left")
            .filter(
                F.coalesce(F.col("df"), F.lit(0))
                - F.coalesce(F.col("sdf"), F.lit(0))
                + F.coalesce(F.col("ndf"), F.lit(0))
                <= max_shingle_freq
            )
            .select("shingle")
        )
        new_sh = new_sh.join(freq, "shingle")
        old_sh = old_sh.join(freq, "shingle")

    a, b = new_sh.alias("a"), new_sh.alias("b")
    nn = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    o = old_sh.alias("o")
    # id_a != id_b: a doc re-delivered in a later batch (same id in both
    # new_docs and old_base) would otherwise yield least==greatest — a
    # degenerate self-edge the one-shot path can never produce, flowing
    # into clustering and duplicating rows in the unioned verify base.
    no = (
        a.join(o, F.col("a.shingle") == F.col("o.shingle"))
        .filter(F.col(f"a.{id_col}") != F.col(f"o.{id_col}"))
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"o.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"o.{id_col}")).alias("id_b"),
        )
    )
    cand = nn.unionByName(no).dropDuplicates(["id_a", "id_b"])
    # Re-delivered ids (same id in new_docs and old_base): the NEW
    # shingle set is authoritative for verify, and the base must stay
    # one-row-per-id — a duplicate id would fan the verify join out into
    # duplicate pair rows, a shape the one-shot path cannot produce.
    base = new_base.unionByName(
        old_base.join(new_base.select(id_col), id_col, "left_anti")
    )
    out = _verify_jaccard(cand, base, id_col, threshold)
    # Hand the batch-frame caches to the consumer: incremental_dup_clusters
    # unpersists them once its eager propagation has materialized every
    # plan that references this pair frame (closing the ADVICE leak where
    # cached batch frames outlived the fold in long-lived sessions).
    out._owned_caches = [new_base, cached_new_sh]  # type: ignore[attr-defined]
    return out


def write_bucketed_layer(
    frame: DataFrame, n_buckets: int, path: str
) -> None:
    """Write any shingle-keyed frame as one bucketed index layer:
    partitioned by ``pmod(xxhash64(shingle), n_buckets)``, sorted by
    ``shingle_h`` within each bucket so pruned lookups row-group-skip.
    SINGLE source of truth for the layout — materialize's one-shot
    postings/df tables and the dedup stream's per-batch layers all
    write through here, and the bucketed reader is only correct while
    every writer agrees on (hash, modulus, sort key) exactly."""
    (
        frame.withColumn("shingle_h", F.xxhash64("shingle"))
        .withColumn(
            "bucket",
            F.pmod("shingle_h", F.lit(int(n_buckets))).cast("int"),
        )
        .repartition("bucket")
        .sortWithinPartitions("bucket", "shingle_h")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def write_bucketed_df(sh: DataFrame, n_buckets: int, path: str) -> None:
    """Per-shingle document counts of a posting stream, in the same
    bucketed/sorted layout (the cap lookup reads both the same way)."""
    write_bucketed_layer(
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")),
        n_buckets,
        path,
    )


def _capped_keys(key_frame: DataFrame, max_in: int) -> list | None:
    """At most ``max_in`` distinct keys off ``key_frame``'s single
    column, or None when the set exceeds the cap. ONE job either way —
    ``limit(max_in + 1)`` short-circuits via LocalLimit, so the driver
    payload is capped at max_in+1 rows NO MATTER the batch size. This is
    the large-batch de-collect (VERDICT r9 item 6): the old
    unconditional ``collect()`` regime probe put O(batch) keys on the
    driver (a 10M-doc batch ≈ 100 MB of ids) just to DECIDE the regime;
    now the big regime is detected from one extra row and the key list
    is never materialized — every prune past the cap runs through the
    broadcast semi-join on the frame itself. ``key_frame`` must be
    distinct-keyed (callers pass .distinct() or contract-unique ids)."""
    sample = [r[0] for r in key_frame.limit(max_in + 1).collect()]
    return sorted(sample) if len(sample) <= max_in else None


def _keys_pruned_capped(
    scan: DataFrame,
    col: str,
    key_frame: DataFrame,
    max_in: int,
) -> tuple[DataFrame, list | None]:
    """Row-prune ``scan`` to rows whose ``col`` is in a batch-derived
    key set, with the key list materialized ONLY in the pushed-In
    regime (see ``_capped_keys``). Two regimes, both measured (SCALE.md
    round 9): at or under ``max_in`` keys a literal ``isin`` — Catalyst
    pushes the In to the parquet scan, and on a layout sorted by
    ``col`` row-group/page min-max stats skip everything but matched
    groups (the micro-batch regime: I/O tracks matches); above it a
    broadcast SEMI-JOIN on ``key_frame`` — a thousands-literal In costs
    seconds of driver/plan overhead (measured 8-9s at 17k literals,
    pushdown on or off) while the semi-join is ~1s, columnar, map-side,
    shuffle-free. Returns (pruned scan, values-or-None) so callers can
    derive bucket lists from the values when they exist."""
    vals = _capped_keys(key_frame, max_in)
    if vals is None:
        return scan.join(F.broadcast(key_frame), col, "semi"), None
    return scan.filter(F.col(col).isin(vals)), vals


def ngram_jaccard_pairs_incremental_bucketed(
    spark,
    new_docs: DataFrame,
    state_dir: str | None = None,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | None = None,
    max_in_pushdown: int = 2048,
    postings: DataFrame | None = None,
    shingle_df: DataFrame | None = None,
    old_base: DataFrame | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """``ngram_jaccard_pairs_incremental_indexed`` with the per-batch
    old-corpus scans replaced by PRUNED INDEX LOOKUPS — identical output
    (same candidates, same union document frequencies, same exact-verify
    rule), per-batch posting I/O bounded by the MATCH volume instead of
    the standing corpus (the round-8 residual: SCALE.md measured the
    batch tail growing 2.69x at a 10x corpus, entirely the map-side
    posting scan of ``old_base``).

    Lookup order is CAP-FIRST, which is what makes the capped tail
    corpus-independent for a fixed batch:

    1. union document frequency is resolved for the batch's shingles
       BEFORE any posting is read — persisted per-shingle df (a pruned
       lookup on the bucket-partitioned ``shingle_df``), minus the
       re-delivered docs' stale counts (their old rows fetched from the
       id-sorted ``old_base`` by id — a batch-bounded pruned read, not
       a posting scan), plus the batch counts;
    2. only shingles SURVIVING the cap reach the posting index, so the
       matched posting volume is <= max_shingle_freq x |capped batch
       shingles| rows — bounded by the batch and the cap, NOT the
       corpus. (Uncapped runs have no such bound by definition: every
       match is a candidate that must be verified, and match volume is
       the workload's own size.)
    3. the verify stage re-fetches only CANDIDATE old docs from the
       id-sorted ``old_base`` — never the full array column.

    Each pruned read goes through ``_keys_pruned_capped``: a literal pushed
    ``In`` when the key set is small (parquet row-group/page skipping
    on the sorted layout — the micro-batch regime), a broadcast
    semi-join past ``max_in_pushdown`` keys (a thousands-literal In
    measured 8-9s of Catalyst/serialization overhead at 17k literals vs
    ~1s for the equivalent semi-join — SCALE.md round 9). Directory
    pruning on the shingle-hash bucket applies in both regimes.

    Exactness is never delegated to the hash: pruned postings re-join
    the batch on the shingle STRING (a colliding hash admits extra scan
    rows that drop out of the equi-join), and every candidate is
    verified against FULL shingle sets — so output is bit-identical to
    the one-shot batch operator's touching-new subset (property-tested
    against both).

    Driver payload is CAPPED, not merely batch-bounded (round 10,
    VERDICT r9 item 6): every key-list probe (batch ids, batch shingle
    hashes, capped lookup hashes, candidate old ids) goes through
    ``_capped_keys`` — a LocalLimit(max_in_pushdown+1) collect that
    either returns the small key list for the pushed-In regime or
    detects the large-batch regime from one extra row, in which case
    NO key list is ever materialized and the prune is the broadcast
    semi-join on the executor-side frame. The only other driver rows
    are the distinct-bucket lists (<= n_buckets each) that keep
    directory pruning alive in the large regime. A 10M-doc batch puts
    ~16 KB on the driver where the round-9 code put ~100 MB.

    SOURCES: by default the three index artifacts are read from
    ``state_dir`` (materialize_incremental_state's layout). A LAYERED
    caller — the dedup stream, whose state is per-batch
    ``postings/batch=k/bucket=j`` dirs — passes ``postings`` /
    ``shingle_df`` / ``old_base`` frames directly (already filtered to
    its standing layers) plus ``n_buckets``; partition/pushed filters
    compose with the caller's partition-column filters, and the
    per-shingle df lookup SUMS across layers (a no-op for the
    single-table layout, the exact union count for per-batch tables —
    valid because the stream's first-delivery-wins guard keeps ids
    unique across layers, so no stale copy ever double-counts).
    """
    if state_dir is None and (
        postings is None or shingle_df is None or old_base is None
        or n_buckets is None
    ):
        raise ValueError(
            "pass state_dir, or all of postings/shingle_df/old_base/n_buckets"
        )
    new_base = _shingle_base(new_docs, text_col, id_col, n).cache()
    # sz (full per-doc shingle count) rides each exploded row: the capped
    # branch's prune derives every per-doc stat from the shingle rows
    # themselves (one window) instead of a separate stats frame joined
    # back three ways — one int per cached row buys three fewer
    # broadcast-build jobs per batch
    new_sh = (
        new_base.select(
            F.col(id_col),
            F.size("shingles").alias("sz"),
            F.explode("shingles").alias("shingle"),
        )
        .withColumn("shingle_h", F.xxhash64("shingle"))
        .cache()
    )
    if state_dir is not None:
        # the modulus is a property of the persisted state — always read
        # the pinned value; a caller-supplied mismatch would mis-prune
        # every bucketed read into silently incomplete output
        pinned = int(
            spark.read.parquet(f"{state_dir}/meta")
            .collect()[0]
            .posting_buckets
        )
        if n_buckets is not None and int(n_buckets) != pinned:
            raise ValueError(
                f"n_buckets={n_buckets} contradicts the state's pinned "
                f"posting_buckets={pinned} ({state_dir}/meta)"
            )
        n_buckets = pinned
    bucket_of = F.pmod("shingle_h", F.lit(int(n_buckets))).cast("int")
    all_hashes = new_sh.select("shingle_h").distinct()
    # capped regime probe: at most max_in+1 rows hit the driver; None
    # means the large-batch regime (semi-join prunes, keys never leave
    # the executors)
    hvals = _capped_keys(all_hashes, max_in_pushdown)

    def _prune(scan: DataFrame, col: str, vals, frame: DataFrame) -> DataFrame:
        # the two _keys_pruned_capped regimes, driven by an already-decided
        # capped key list instead of re-collecting
        if vals is not None:
            return scan.filter(F.col(col).isin(vals))
        return scan.join(F.broadcast(frame), col, "semi")

    def _bucket_list(vals, frame: DataFrame) -> list[int]:
        # distinct buckets for the directory filter: derived in Python
        # from the in-hand values in the pushed-In regime (python % ==
        # pmod for a positive modulus), else ONE <=n_buckets-row
        # aggregate — never O(batch) rows on the driver
        if vals is not None:
            return sorted({int(h) % int(n_buckets) for h in vals})
        return sorted(
            r.bucket
            for r in frame.select(bucket_of.alias("bucket"))
            .distinct()
            .collect()
        )

    id_type = dict(new_docs.dtypes)[id_col]
    if hvals == []:
        # nothing downstream references the batch frames (the output is
        # a literal empty frame): release them NOW rather than handing
        # them to a consumer that may never fold an empty batch
        new_sh.unpersist()
        new_base.unpersist()
        return spark.createDataFrame(
            [], f"id_a {id_type}, id_b {id_type}, jaccard double"
        )

    new_ids = new_base.select(id_col)
    base_scan = (
        old_base
        if old_base is not None
        else spark.read.parquet(f"{state_dir}/old_base")
    )
    owned = [new_base, new_sh]
    # the batch's distinct-bucket list, computed ONCE (r14): it prunes
    # the df lookup directly, and in the large-batch regime it also
    # serves as the posting scan's directory filter — a sound SUPERSET
    # of the capped set's buckets (the semi-join below does the exact
    # row pruning), saving the second distinct-bucket collect job
    batch_buckets = _bucket_list(hvals, all_hashes)

    if max_shingle_freq is not None:
        # union df per BATCH shingle only (non-batch shingles generate no
        # candidates, so their cap status is irrelevant): persisted old
        # df, minus the re-delivered docs' stale counts, plus the batch
        # counts — the indexed path's reconstruction, from pruned reads.
        # The batch-id key list is capped like every other probe: a
        # large batch drives the stale-row fetch through the semi-join
        # without ever landing its ids on the driver.
        id_vals = _capped_keys(new_ids, max_in_pushdown)
        redeliv = _prune(base_scan, id_col, id_vals, new_ids).select(
            F.explode("shingles").alias("shingle")
        )
        stale_cnt = redeliv.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("sdf")
        )
        new_cnt = new_sh.groupBy("shingle", "shingle_h").agg(
            F.count(F.lit(1)).alias("ndf")
        )
        df_src = (
            shingle_df
            if shingle_df is not None
            else spark.read.parquet(f"{state_dir}/shingle_df")
        )
        df_scan = df_src.filter(F.col("bucket").isin(batch_buckets))
        # sum across layers: one row per shingle in the single-table
        # layout (sum of one — exact no-op); per-batch df tables in the
        # layered layout add up to the exact union count (ids unique
        # across layers by the caller's contract)
        old_df_b = (
            _prune(df_scan, "shingle_h", hvals, all_hashes)
            .groupBy("shingle")
            .agg(F.sum("df").alias("df"))
        )
        # freq is the CAPPED batch-shingle set — batch-bounded; cached
        # because it feeds the lookup-key collect, the posting prune,
        # and the batch-side join below
        freq = (
            new_cnt.join(F.broadcast(old_df_b), "shingle", "left")
            .join(F.broadcast(stale_cnt), "shingle", "left")
            .filter(
                F.coalesce(F.col("df"), F.lit(0))
                - F.coalesce(F.col("sdf"), F.lit(0))
                + F.coalesce(F.col("ndf"), F.lit(0))
                <= max_shingle_freq
            )
            .select("shingle", "shingle_h")
            .cache()
        )
        owned.append(freq)
        nsh = new_sh.join(F.broadcast(freq.select("shingle")), "shingle")
        lookup_hashes = freq.select("shingle_h").distinct()
        if hvals is None:
            # Large-batch regime (r14, guide §1.2/§5): the capped lookup
            # set is batch-sized too, so probing whether it fits the
            # pushed-In cap would execute the whole freq plan as its own
            # driver-blocking job (measured 1.2 s on the x117b sf0.1
            # batch) only to answer "no". Go straight to the semi-join
            # prune; freq then materializes inside the candidate-
            # generation checkpoint job instead of a separate eager
            # step, and the posting directory filter reuses the batch's
            # own bucket list (superset — sound).
            lvals = None
            lookup_buckets = batch_buckets
        else:
            # micro-batch regime: freq is tiny (subset of <= max_in
            # batch hashes) — the exact capped probe and its own bucket
            # list keep the pushed In(shingle_h) + minimal directory
            # filter the plan gate pins
            lvals = _capped_keys(lookup_hashes, max_in_pushdown)
            lookup_buckets = _bucket_list(lvals, lookup_hashes)
    else:
        nsh = new_sh
        lookup_hashes = all_hashes
        lvals = hvals
        lookup_buckets = batch_buckets

    post_scan = (
        postings
        if postings is not None
        else spark.read.parquet(f"{state_dir}/postings")
    )
    if lvals == []:  # every batch shingle is over-cap: no posting joins
        post = post_scan.filter(F.lit(False))
    else:
        post = _prune(
            post_scan.filter(F.col("bucket").isin(lookup_buckets)),
            "shingle_h",
            lvals,
            lookup_hashes,
        )
    # re-delivered ids: the one-shot corpus is (old \\ new) UNION new —
    # stale postings of a re-delivered doc leave the candidate side
    live_post = post.join(F.broadcast(new_ids), id_col, "left_anti")

    a, b = nsh.alias("a"), nsh.alias("b")
    # the batch side BROADCASTS into the pruned posting scan — the
    # standing tier is never exchanged (cap filter on the posting side
    # is redundant: a candidate needs a shared shingle that SURVIVED the
    # cap on the batch side, and cap status is a property of the shingle)
    an = nsh.select(F.col(id_col).alias("__nid"), "shingle")
    if max_shingle_freq is not None:
        # round-13: raw shared-shingle candidates pass the one-shot
        # capped path's SOUND Jaccard upper bound before any verify I/O:
        #   true_common <= n_cc + dropped_new
        # (a shared shingle lives in the NEW doc's set, so it is either
        # under the union cap — in nsh AND findable in the uncapped
        # posting tier, hence counted by the pair aggregate — or over
        # the cap, bounded by the new side's dropped count). For
        # new-old pairs the old doc's size is unknown without touching
        # old_base, but sz_old >= true_common gives
        #   jaccard <= ub / sz_new
        # — batch-side-only, no standing-corpus read. New-new pairs use
        # the full two-sided bound. Only survivors reach the checkpoint,
        # the old_base re-fetch, and the per-pair array intersect; the
        # sf0.1 batch fed ~100k raw candidates to a 4.9 s single-task
        # verify of which a few dozen pass — the prune drops the
        # hopeless ones using counts the joins already produce. The
        # verify still decides membership, so output is unchanged.
        # (1e-9: prune-only soundness margin for the float boundary.)
        # Per-doc stats ride the shingle rows: sz came with new_sh, kept
        # is one window count over the capped rows, dropped = sz - kept.
        # The nn/no aggregates then read the stats for free (constant per
        # group -> min), with NO stats frame and no broadcast-build jobs.
        stat = nsh.withColumn(
            "dropped",
            F.col("sz") - F.count(F.lit(1)).over(W.partitionBy(id_col)),
        )
        sa, sb = stat.alias("a"), stat.alias("b")
        nn_cnt = sa.join(
            sb,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        ).agg(
            F.count(F.lit(1)).alias("n_cc"),
            F.min("a.sz").alias("sz_a"),
            F.min("a.dropped").alias("drop_a"),
            F.min("b.sz").alias("sz_b"),
            F.min("b.dropped").alias("drop_b"),
        )
        nn_ub = F.col("n_cc") + F.least(F.col("drop_a"), F.col("drop_b"))
        nn = nn_cnt.filter(
            nn_ub / (F.col("sz_a") + F.col("sz_b") - nn_ub)
            >= threshold - 1e-9
        ).select("id_a", "id_b")
        an_stat = stat.select(
            F.col(id_col).alias("__nid"), "shingle", "sz", "dropped"
        )
        no = (
            live_post.join(F.broadcast(an_stat), "shingle")
            .filter(F.col("__nid") != F.col(id_col))
            .groupBy(F.col("__nid"), F.col(id_col).alias("__oid"))
            .agg(
                F.count(F.lit(1)).alias("n_cc"),
                F.min("sz").alias("sz"),
                F.min("dropped").alias("dropped"),
            )
            .filter(
                (F.col("n_cc") + F.col("dropped")) / F.col("sz")
                >= threshold - 1e-9
            )
            .select(
                F.least("__nid", "__oid").alias("id_a"),
                F.greatest("__nid", "__oid").alias("id_b"),
            )
        )
    else:
        nn = a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        no = (
            live_post.join(F.broadcast(an), "shingle")
            .filter(F.col("__nid") != F.col(id_col))
            .select(
                F.least("__nid", id_col).alias("id_a"),
                F.greatest("__nid", id_col).alias("id_b"),
            )
        )
    # eager checkpoint: batch-bounded (two ids per candidate pair); lets
    # the old-candidate id list collect below without re-running
    # candidate generation, and backs the verify + clustering consumers
    cand = (
        nn.unionByName(no)
        .dropDuplicates(["id_a", "id_b"])
        .localCheckpoint(eager=True)
    )
    cand_old = (
        cand.select(F.explode(F.array("id_a", "id_b")).alias(id_col))
        .distinct()
        .join(new_ids, id_col, "left_anti")
    )
    cand_vals = _capped_keys(cand_old, max_in_pushdown)
    if cand_vals == []:
        old_rows = spark.createDataFrame(
            [], f"{id_col} {id_type}, shingles array<string>"
        )
    else:
        old_rows = _prune(base_scan, id_col, cand_vals, cand_old).select(
            F.col(id_col), "shingles"
        )
    base = new_base.unionByName(old_rows)
    out = _verify_jaccard(cand, base, id_col, threshold)
    out._owned_caches = owned  # type: ignore[attr-defined]
    # the candidate stage executes eagerly (checkpoint) before return,
    # so its pruned scans never appear in `out`'s plan — expose them for
    # the plan gate (test_plan_quality asserts the partition filter and
    # the regime-appropriate row pruning on the operator-built frames)
    out._plan_probes = {  # type: ignore[attr-defined]
        "postings": post,
        "old_base_refetch": old_rows,
    }
    return out


def canonical_map(
    docs: DataFrame,
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Canonical-copy selection: for every document, the single cluster
    member to KEEP — the highest-``score_col`` copy (ties to the lowest
    id). Pairwise dedup answers "are these two the same?"; a real
    pipeline must then answer "which copy survives?", and deleting an
    arbitrary member throws away the best-quality text. Output: one row
    per input doc — (id, cluster_id, canonical_id, is_canonical, score);
    singletons (never paired) are their own canonical.

    Scale shape: ``clusters`` is only the PAIRED docs (tiny vs the
    corpus); the rank window partitions by cluster_id, so the only
    corpus-sized steps are two id-keyed hash joins — no global sort, no
    driver state.
    """
    # r13 note: a "one-pass" variant was tried here — left-join members,
    # lift the winner onto every row with first() over a full-frame
    # (unbounded-following) cluster_id window — and MEASURED SLOWER
    # (x105 3.6->4.5s, x104 4.6->4.9s at sf0.1): the buffering
    # full-frame window costs more than the extra cluster_id exchange it
    # removes, because the rank-filter shrinks the frame to one row per
    # cluster before the join-back (which broadcasts) and ``clusters``
    # is a checkpointed RDD whose second evaluation is a block read.
    # Kept in the rank-filter + join-back shape deliberately.
    member = clusters.join(scores, id_col)
    w = W.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.col(id_col)
    )
    canon = (
        member.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cluster_id", F.col(id_col).alias("canonical_id"))
    )
    resolved = clusters.join(canon, "cluster_id")
    return (
        docs.select(id_col)
        .join(scores, id_col, "left")
        .join(resolved, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
            F.coalesce(F.col("canonical_id"), F.col(id_col)).alias(
                "canonical_id"
            ),
            (
                F.coalesce(F.col("canonical_id"), F.col(id_col))
                == F.col(id_col)
            ).alias("is_canonical"),
            F.col(score_col),
        )
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
) -> DataFrame:
    """Pairs with cosine >= threshold, blocked by a coarse partition column.

    ``block_col`` is the IVF-style coarse-quantizer cell: pairs are only
    compared within a cell, turning O(n^2) into O(sum of cell^2) — the
    standard scale path for embedding dedup.

    Round-13 (guide §4.2): the blocked path scores each cell's pair space
    with vectorized NumPy per Arrow cogroup instead of the JVM's
    interpreted zip_with fold in the join condition (the round-13 x05
    before-plan evaluates that fold once per CANDIDATE pair — every
    within-cell pair — and the thread-dump profile put ~all of the stage
    there). ``similarity.exact_cos_matrix`` reproduces the fold's IEEE
    sequence exactly (rank-1-update accumulation — see its docstring), so
    the emitted cos_sim is bit-identical to the previous plan's and every
    downstream round/threshold/ordering decision is unchanged (in-session
    parity harness compared int64 bit patterns at sf0.01 and sf0.1:
    equal). Per-task memory is bounded by row-chunking; the one exchange
    is the cell cogroup (vs the broadcast build of the join path).

    ``block_col=None`` keeps the JVM broadcast cross-join fold (unused on
    any scale path; retained for API completeness).
    """
    if block_col:
        from .similarity import exact_cos_matrix

        id_t = dict(df.dtypes)[id_col]
        blk_t = dict(df.dtypes)[block_col]
        thr = float(threshold)

        def score(pdf: pd.DataFrame) -> pd.DataFrame:
            n = len(pdf)
            empty = pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    block_col: pdf[block_col].iloc[:0],
                    "cos_sim": pd.Series([], dtype="float64"),
                }
            )
            if n < 2:
                return empty
            pdf = pdf.sort_values(id_col, ignore_index=True)
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # row-chunked: bounded scratch even for a hot cell
            chunk = max(1, (4 << 20) // max(n, 1))
            ka, kb, ks = [], [], []
            for s in range(0, n, chunk):
                e = min(n, s + chunk)
                C = exact_cos_matrix(M[s:e], M)
                li, lj = np.nonzero(C >= thr)
                gi = li + s
                m = gi < lj  # id_a < id_b == position order after sort
                ka.append(ids[gi[m]])
                kb.append(ids[lj[m]])
                ks.append(C[li[m], lj[m]])
            ida = np.concatenate(ka)
            if not len(ida):
                return empty
            out = pd.DataFrame(
                {
                    "id_a": ida,
                    "id_b": np.concatenate(kb),
                    block_col: pdf[block_col].iloc[0],
                    "cos_sim": np.concatenate(ks).astype(np.float64),
                }
            )
            return out

        return (
            df.select(F.col(id_col), F.col(vec_col), F.col(block_col))
            .groupBy(block_col)
            .applyInPandas(
                score,
                schema=(
                    f"id_a {id_t}, id_b {id_t}, "
                    f"{block_col} {blk_t}, cos_sim double"
                ),
            )
        )

    cols = [F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")]
    e = df.select(*cols).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    a, b = e.alias("a"), e.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    sim = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    out = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        sim.alias("cos_sim"),
    )
    return out.filter(F.col("cos_sim") >= threshold)


def _bloom_params(expected_items: int, fpp: float) -> tuple[int, int, int]:
    """(n_bits, n_bytes, n_hashes) for a Bloom filter at the standard
    optimum: n_bits = -n ln(fpp)/ln(2)^2, n_hashes = bits/n * ln(2)."""
    n_bits = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    return n_bits, (n_bits + 7) // 8, max(1, round(n_bits / expected_items * math.log(2)))


def _bloom_hash_cols(key: str) -> tuple:
    """THE double-hash recipe: two independent 64-bit hashes per key
    (xxhash64 with/without a salt); bit positions come from
    Kirsch-Mitzenmacher double hashing h1 + i*h2. Every build and probe
    site MUST derive its hash columns here — a drifted salt or position
    rule would silently break the no-false-negative guarantee."""
    return (
        F.xxhash64(F.col(key)),
        F.xxhash64(F.col(key), F.lit("bloom-salt")),
    )


def _bloom_hashes(df: DataFrame, key: str) -> DataFrame:
    """Key column + its two bloom hashes (build sites read only the
    hashes; probe sites keep the key to route maybe-hits onward)."""
    h1, h2 = _bloom_hash_cols(key)
    return df.select(F.col(key), h1.alias("__h1"), h2.alias("__h2"))


def _bloom_positions(h1: np.ndarray, h2: np.ndarray, i: int, n_bits: int) -> np.ndarray:
    return (h1 + np.uint64(i) * h2) % np.uint64(n_bits)


def _bloom_build_bitmap(
    keys_df: DataFrame, key: str, n_bits: int, n_bytes: int, n_hashes: int
) -> np.ndarray:
    """Distributed bitmap build: per-partition partial bitmaps map-side
    (mapInPandas over the hash pairs), OR-reduced to one, collected as a
    single n_bytes blob — a bounded model artifact (~1.2 MB per 10^6
    expected keys at 1% fpp), never the key set itself."""

    def build(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            h1 = pdf["__h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = pdf["__h2"].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(n_hashes):
                pos = _bloom_positions(h1, h2, i, n_bits)
                np.bitwise_or.at(
                    bm,
                    (pos // 8).astype(np.int64),
                    (np.uint8(1) << (pos % 8).astype(np.uint8)),
                )
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    def or_reduce(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            for blob in pdf["bm"]:
                bm |= np.frombuffer(blob, dtype=np.uint8)
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    one = (
        _bloom_hashes(keys_df, key)
        .select("__h1", "__h2")  # build reads only the hashes — never
        # ship the raw keys through the Arrow pass
        .mapInPandas(build, schema="bm binary")
        .coalesce(1)
        .mapInPandas(or_reduce, schema="bm binary")
        .collect()
    )
    return (
        np.frombuffer(one[0]["bm"], dtype=np.uint8)
        if one
        else np.zeros(n_bytes, dtype=np.uint8)
    )


def _bloom_might_contain(spark, bitmap: np.ndarray, n_bits: int, n_hashes: int):
    """Vectorized membership-test UDF factory over the broadcast bitmap:
    returns a callable (h1_col, h2_col) -> boolean Column. False means
    PROVABLY absent (the prune direction); True means maybe."""
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def _might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bm = bc.value
        a = h1.to_numpy(dtype=np.int64).view(np.uint64)
        b = h2.to_numpy(dtype=np.int64).view(np.uint64)
        acc = np.ones(len(a), dtype=bool)
        for i in range(n_hashes):
            pos = _bloom_positions(a, b, i, n_bits)
            acc &= (
                bm[(pos // 8).astype(np.int64)]
                >> (pos % 8).astype(np.uint8)
            ) & 1 == 1
        return pd.Series(acc)

    return _might_contain


def bloom_incremental_dedup(
    new: DataFrame,
    seen: DataFrame,
    key: str = "fp",
    expected_items: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Incremental dedup with a Bloom-filter prune: keep the rows of
    ``new`` whose ``key`` does not appear in ``seen`` — bit-identical to
    ``new.join(seen, key, "left_anti")``, but structured for the 100 TB
    arrival path where ``seen`` is a multi-billion-key fingerprint index
    and most arriving rows are genuinely new.

    Plan shape: one pass over the seen keys builds per-partition Bloom
    bitmaps map-side (mapInPandas over xxhash64 pairs), OR-reduced to a
    single bitmap a few MB wide at ``expected_items``/``fpp``; the
    bitmap broadcasts and every new row tests membership MAP-SIDE
    (vectorized pandas UDF, Kirsch-Mitzenmacher double hashing). Rows
    the filter rejects are PROVABLY unseen (no false negatives) and skip
    the join entirely; only the ~``fpp`` false-positive slice plus the
    true duplicates — not the whole batch — pays the exact anti-join
    that removes false positives. The exact join makes the operator's
    output independent of ``fpp``; the knob only moves the
    prune-vs-verify cost split. Reference has no incremental surface
    (nearest: Cosmos upsert-by-id, blob_to_cosmosdb.py:34).
    """
    n_bits, n_bytes, n_hashes = _bloom_params(expected_items, fpp)
    spark = new.sparkSession
    # Partial bitmaps build map-side (one per partition), OR-reduce to one,
    # and the final n_bits/8-byte bitmap ships as a broadcast variable —
    # a bounded model artifact (~1.2 MB per 10^6 expected keys at 1% fpp),
    # the same class of driver round-trip as the PQ codebooks. Build and
    # probe share the _bloom_* recipe with the dedup stream's membership
    # artifact (one source of truth for salt/position rule).
    bitmap = _bloom_build_bitmap(seen, key, n_bits, n_bytes, n_hashes)
    _might_contain = _bloom_might_contain(spark, bitmap, n_bits, n_hashes)
    h1, h2 = _bloom_hash_cols(key)
    tested = new.withColumn("__maybe", _might_contain(h1, h2))
    provably_new = tested.filter(~F.col("__maybe")).drop("__maybe")
    suspects = tested.filter(F.col("__maybe")).drop("__maybe")
    verified_new = suspects.join(seen.select(key).distinct(), key, "left_anti")
    return provably_new.unionByName(verified_new)


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    indexed: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication of an embedding corpus
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication" — public arXiv:2303.09540).

    Pipeline, entirely from this repo's primitives: (1) k-means-partition
    the embedding space with the same MLlib coarse quantizer the IVF
    index uses (``build_ivf_index``); (2) compare pairs only WITHIN a
    cell (``embedding_near_dup`` with ``block_col="cell"`` — O(Σ cell²),
    never O(n²)); (3) resolve transitive duplicate groups
    (``dup_clusters``); (4) keep ONE deterministic representative per
    group (the min id, which IS the cluster label).

    Returns one row per input vector: (id, cluster_id, kept).
    Singletons are their own cluster and always kept. Cross-cell
    near-dups are missed by design — the SemDeDup trade: semantic
    duplicates embed close together and land in the same cell with high
    probability, and that blocking is exactly what makes the op feasible
    at 100 TB (per-cell self-joins, no global pair space). Reference has
    no dedup surface (SURVEY §2.11 north-star op).
    """
    if indexed is None:
        # The k-means fit is the expensive step; repeated dedup runs over
        # a growing corpus should build the cell index once
        # (build_ivf_index with index_path) and pass it via ``indexed``.
        from .ann_index import build_ivf_index

        indexed, _ = build_ivf_index(
            df, k=n_cells, vec_col=vec_col, id_col=id_col
        )
    pairs = embedding_near_dup(
        indexed, threshold, vec_col=vec_col, id_col=id_col, block_col="cell"
    )
    clusters = dup_clusters(pairs.select("id_a", "id_b")).withColumnRenamed(
        "doc_id", id_col
    )
    return (
        df.select(F.col(id_col))
        .join(clusters, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("kept", F.col(id_col) == F.col("cluster_id"))
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str | None = None,
    chunk_tokens: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level line deduplication (the C4 / RefinedWeb cleanup op):
    any line that appears verbatim in >= ``min_docs`` DISTINCT documents
    is boilerplate (nav bars, license banners, cookie notices) and is
    removed from EVERY document; surviving lines are re-joined in their
    original order.

    ``sep`` is the line delimiter for real corpora (``"\\n"``). When
    ``sep`` is None the unit is an aligned non-overlapping span of
    ``chunk_tokens`` whitespace tokens — the span-granular variant for
    single-line documents (and the mode the driver testdata exercises).

    Scale shape (100 TB): explode is map-side; the duplicate-line table
    is produced by one hash aggregation on the line text (at scale, key
    by ``xxhash64(line)`` to shuffle 8-byte keys) and is *small* -- only
    lines crossing the frequency threshold survive the HAVING -- so AQE
    picks a broadcast anti-join at runtime (not forced: boilerplate-heavy
    corpora can make it large) and the only other shuffle is the
    per-document regroup. Reference has no dedup surface (nearest: Cosmos upsert-by-id,
    blob_to_cosmosdb.py:34); op mandated by the north star.
    """
    joiner = sep if sep is not None else " "
    if sep is not None:
        # F.split takes a Java regex; the separator is a LITERAL joiner
        # (sep="." must split on dots, not every char). \Q...\E-quote it,
        # Pattern.quote-style (embedded \E is closed and reopened).
        quoted = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
        lines_arr = F.split(F.col(text_col), quoted)
    else:
        toks = F.split(F.col(text_col), " ")
        n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_tokens))).cast("int")
        lines_arr = F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
            ),
        )

    exploded = df.select(
        F.col(id_col), F.posexplode(lines_arr).alias("pos", "line")
    )
    dup_lines = (
        exploded.groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line")
    )
    # No forced broadcast: dup_lines is usually small (only lines past the
    # HAVING threshold) but its cardinality is data-dependent — at real
    # boilerplate rates a mandatory BroadcastExchange is an OOM risk. Let
    # AQE pick broadcast vs shuffle from the measured size at runtime.
    kept = exploded.join(dup_lines, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            joiner,
        ).alias("_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    base = df.select(F.col(id_col), F.size(lines_arr).cast("bigint").alias("n_lines"))
    return base.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce("_clean", F.lit("")).alias(text_col),
        F.col("n_lines"),
        (F.col("n_lines") - F.coalesce("_n_kept", F.lit(0))).cast("bigint").alias("n_removed"),
    )


def substring_span_dedup(
    df: DataFrame,
    n: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring-span deduplication (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" flavor,
    declaratively): a token is removed iff some token n-gram COVERING it
    occurs in >= ``min_df`` distinct documents — boilerplate, licenses,
    templated spans vanish from every copy while document-unique prose
    survives. Whole-document dedup (x01/x02) misses these; this is the
    span-level complement.

    Plan: positional tokens + positional n-grams are both map-side
    (posexplode over the token array); the hot-gram set is one grouped
    distinct-count; covered positions come from hot grams exploded over
    their n token offsets; survivors are a positional anti-join,
    reassembled with sort_array(collect_list(struct(pos, token))) —
    deterministic order without a per-doc sort partition. Output one
    row per input doc: (id, n_tokens, n_removed, clean_text).

    At 100 TB the gram table is |corpus tokens|-sized: the same
    stop-gram capping / bucketing arguments as ngram_jaccard_pairs
    apply, and min_df thresholding happens in partial aggregation
    (map-side combine) before any row leaves its executor.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # Both multiply-consumed map-side stages are cached (r14, guide
    # §1.2: evaluate each expensive subtree once). ``base`` (the token
    # arrays) feeds tok, grams, and sizes — three evaluations of the
    # regex split otherwise; ``grams`` (the positional n-gram strings,
    # the heaviest per-row expression here: n-token concat per
    # position) feeds the hot-gram aggregate AND the covered-position
    # join — two evaluations otherwise. A/B at sf0.1: 3.0 s -> 1.5 s.
    # Handed to the caller via the ``_owned_caches`` convention (the
    # bench/oracle harness clears caches per query); cache() spills to
    # disk under pressure, and the alternative at 100 TB — re-running
    # the concat chain over the corpus per consumer — is strictly
    # worse.
    base = df.select(
        F.col(id_col), F.filter(toks, lambda x: x != "").alias("t")
    ).filter(F.size("t") > 0).cache()
    tok = base.select(F.col(id_col), F.posexplode("t").alias("pos", "token"))
    grams = base.filter(F.size("t") >= n).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda s: F.concat_ws(" ", F.slice("t", s + 1, n)),
            )
        ).alias("start", "gram"),
    ).cache()
    hot = (
        grams.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    covered = (
        grams.join(hot, "gram")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("start"), F.col("start") + n - 1)
            ).alias("pos"),
        )
        .distinct()
    )
    kept = (
        tok.join(covered, [id_col, "pos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s.token,
                ),
            ).alias("clean_text"),
        )
    )
    sizes = base.select(F.col(id_col), F.size("t").cast("long").alias("n_tokens"))
    out = sizes.join(kept, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )
    out._owned_caches = [base, grams]  # type: ignore[attr-defined]
    return out


def priority_dedup(
    df: DataFrame,
    priority: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source exact dedup with a survivorship policy: when the
    same text arrives from several sources, keep the copy from the
    highest-priority source (``priority`` is best-first; unlisted
    sources rank after every listed one, ids break ties).

    This is the multi-corpus merge step of a training-data pipeline —
    curated > books > web — where `exact_dedup`'s min-id rule is wrong
    because identity of the KEPT row (its source, its metadata, its
    license) matters, not just the text. Complements `canonical_map`,
    which picks by per-document quality within near-dup clusters; here
    the policy is per-SOURCE and the groups are exact.

    Scale shape: the shuffle carries (64-bit hash, priority, id,
    source) — never the text; one rank window over the high-cardinality
    hash key plus one group-by for the multiplicity stats, both
    partitioned by the same key so AQE coalesces them into one
    exchange. Reference contrast: `blob_to_cosmosdb.py:32-38` upserts
    by id, so cross-source copies silently coexist.

    NULL text: md5(NULL) is NULL, and NULL group keys would first
    collapse every NULL-text row into one window partition and then
    vanish entirely at the kept-join (NULL never equi-matches) — silent
    data loss for rows the readers legitimately produce (null-on-error
    casts). The key is therefore NULL-safe: each NULL-text row gets a
    per-id sentinel key ('null:<id>' — cannot collide with 32-hex md5),
    so it passes through as its own group with n_copies = 1.
    """
    prio: Column = F.lit(len(priority))
    for r, s in reversed(list(enumerate(priority))):
        prio = F.when(F.col(source_col) == s, r).otherwise(prio)
    slim = df.select(
        F.coalesce(
            F.md5(F.col(text_col)),
            F.concat(F.lit("null:"), F.col(id_col).cast("string")),
        ).alias("content_hash"),
        prio.alias("prio"),
        F.col(id_col),
        F.col(source_col),
    )
    w = W.partitionBy("content_hash").orderBy("prio", id_col)
    kept = (
        slim.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("content_hash", id_col, source_col)
    )
    stats = slim.groupBy("content_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct(source_col).alias("n_sources"),
    )
    return kept.join(stats, "content_hash").select(
        id_col, source_col, "n_copies", "n_sources"
    )


def propagate_deletes(
    clusters: DataFrame,
    deletes: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Right-to-be-forgotten propagation through the materialized dedup
    state: given a (small) frame of ids to erase, report — for every
    cluster that LOSES a member — the canonical re-election outcome:

        cluster_id | old_canonical | new_canonical | n_before | n_after

    ``new_canonical`` is NULL when the whole cluster is erased. The
    canonical rule is identical to `canonical_map` (score desc, id
    asc), so downstream consumers of the standing cluster artifact can
    apply this delta instead of re-mining pairs — deletion must NOT
    cost a corpus rescan at 100 TB.

    Scale shape: ``deletes`` is broadcast into a semi-join that
    restricts everything to AFFECTED clusters (a sliver of the state);
    the rank windows run only over those members. The corpus-sized
    frames appear in id-keyed hash joins only.

    Membership comes from ``clusters`` ALONE; ``scores`` is left-joined
    for the election ordering only (missing scores rank last, ids break
    ties). An inner join here would silently drop scoreless members from
    n_before/n_after and the election — and a deleted scoreless member
    would still mark its cluster affected, emitting a no-change row.
    """
    member = clusters.join(scores, id_col, "left").select(
        id_col, "cluster_id", score_col
    )
    affected = (
        clusters.join(F.broadcast(deletes), id_col, "semi")
        .select("cluster_id")
        .distinct()
    )
    m = member.join(F.broadcast(affected), "cluster_id")
    w = W.partitionBy("cluster_id").orderBy(
        F.desc_nulls_last(score_col), F.col(id_col)
    )
    old = (
        m.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cluster_id", F.col(id_col).alias("old_canonical"))
    )
    n_before = m.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_before"))
    surv = m.join(F.broadcast(deletes), id_col, "anti")
    new = (
        surv.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cluster_id", F.col(id_col).alias("new_canonical"))
    )
    n_after = surv.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    return (
        old.join(n_before, "cluster_id")
        .join(new, "cluster_id", "left")
        .join(n_after, "cluster_id", "left")
        .select(
            "cluster_id",
            "old_canonical",
            "new_canonical",
            "n_before",
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
        )
    )
