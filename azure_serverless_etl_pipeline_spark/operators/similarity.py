"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane) variant as the scale path. Both are pure DataFrame
plans; cosine is a sequential double fold (bit-identical to the DuckDB
oracle — see functions.dot).

Scale notes (100 TB):
- Brute force broadcasts the (small) query set against the full corpus:
  one map-side pass + a top-k window per query — Spark plans the window
  as partial top-k per partition under AQE; no corpus shuffle of vectors.
- The LSH variant hashes each vector into 2^n_planes buckets map-side and
  only scores within matching buckets (+ optional multi-probe), cutting
  the scored candidates by ~bucket-count x at a recall cost — the
  standard ANN trade. Plane directions are deterministic (hash-derived),
  not RNG-dependent, so results are reproducible across runs/engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import dot

_SEED = 42


def exact_cos_matrix(S: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Pairwise cosine between the rows of S and T (float64), bit-identical
    to the JVM expression ``dot(a,b)/(nrm_a*nrm_b)`` (functions.dot — a
    sequential left fold over ascending index).

    The dot accumulation is a loop of RANK-1 UPDATES over the dimension:
    ``C += outer(S[:,k], T[:,k])`` performs, per element, exactly
    p = a_k*b_k (one rounding) then acc = acc + p (one rounding) in index
    order — the same IEEE-double sequence as the zip_with/aggregate fold,
    vectorized across pairs with no BLAS re-association and no FMA
    contraction (numpy ufuncs never fuse). Norms fold the same way;
    the final division sees identical operands. This is what lets the
    pandas-cogroup scorers replace interpreted per-pair JVM folds without
    moving a single output bit (guide §4.2). Cost is GEMM-class flops
    (d elementwise passes over the |S|x|T| matrix); callers chunk rows of
    S to bound the scratch matrix."""
    d = S.shape[1]
    C = np.zeros((S.shape[0], T.shape[0]))
    for k in range(d):
        C += np.outer(S[:, k], T[:, k])

    def _nrm(M: np.ndarray) -> np.ndarray:
        acc = np.zeros(M.shape[0])
        for k in range(M.shape[1]):
            acc += M[:, k] * M[:, k]
        return np.sqrt(acc)

    with np.errstate(divide="ignore", invalid="ignore"):
        return C / np.outer(_nrm(S), _nrm(T))


def _prepped(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    id_alias: str,
    vec_alias: str,
    extra: dict[str, str] | None = None,
):
    """Project (id, double-cast vector, L2 norm [, extras]): norms and casts
    computed once per vector instead of once per scored pair."""
    out = df.select(
        F.col(id_col).alias(id_alias),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_alias),
        *[F.col(src).alias(dst) for src, dst in (extra or {}).items()],
    )
    return out.withColumn(
        f"{vec_alias}_nrm", F.sqrt(dot(F.col(vec_alias), F.col(vec_alias)))
    )


def _cos_pair(qv: str, cv: str):
    return dot(F.col(qv), F.col(cv)) / (F.col(f"{qv}_nrm") * F.col(f"{cv}_nrm"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-match excluded)."""
    q = _prepped(queries, id_col, vec_col, "query_id", "q_vec")
    c = _prepped(corpus, id_col, vec_col, "neighbor_id", "c_vec")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", _cos_pair("q_vec", "c_vec"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _hyperplane_bucket(vec_col, dim: int, n_planes: int):
    """Deterministic random-hyperplane LSH bucket id (0..2^n_planes-1).

    Plane p's direction is pseudo-random per (plane, coordinate) via
    xxhash64 -> uniform in [-1, 1]: reproducible with no RNG state and
    computable identically at write time (index build) and query time.
    """
    two63 = float(1 << 63)
    bucket = F.lit(0)
    for p in range(n_planes):
        coeffs = [
            F.xxhash64(F.lit(_SEED), F.lit(p), F.lit(j)).cast("double") / two63
            for j in range(dim)
        ]
        proj = None
        for j, cf in enumerate(coeffs):
            term = F.element_at(vec_col, j + 1).cast("double") * cf
            proj = term if proj is None else proj + term
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    multiprobe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH bucket.

    With n_planes=4 (16 buckets), ~1/16 of the corpus is scored per query.
    ``multiprobe`` additionally probes every bucket at Hamming distance 1
    from the query's (flip one hyperplane sign) — the standard
    multi-probe LSH recall knob: (1+n_planes)/2^n_planes of the corpus
    scored instead of 1/2^n_planes, recovering the neighbors that fall
    just across one hyperplane. Only the (tiny) query side fans out.
    Output schema matches cosine_topk; recall < 1 by design (rows-only
    correctness check + recall assertions in tests).
    """
    c = _prepped(corpus, id_col, vec_col, "neighbor_id", "c_vec").withColumn(
        "bucket", _hyperplane_bucket(F.col("c_vec"), dim, n_planes)
    )
    q = _prepped(queries, id_col, vec_col, "query_id", "q_vec").withColumn(
        "bucket", _hyperplane_bucket(F.col("q_vec"), dim, n_planes)
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p)).cast("int")
                for p in range(n_planes)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    # no dedup needed: a corpus vector lives in exactly one bucket and the
    # probe buckets are pairwise distinct, so each (query, neighbor) pair
    # appears at most once — keeping the plan shuffle-free up to the rank
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", _cos_pair("q_vec", "c_vec"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: score only within the query's coarse cell.

    Uses a precomputed coarse-quantizer cell column (here the dataset's
    ``label``); at scale the cell id comes from a k-means codebook and the
    corpus is written partitionBy(cell) so a probe touches one partition.
    """
    c = _prepped(
        corpus, id_col, vec_col, "neighbor_id", "c_vec", extra={cell_col: "cell"}
    )
    q = _prepped(
        queries, id_col, vec_col, "query_id", "q_vec", extra={cell_col: "cell"}
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", _cos_pair("q_vec", "c_vec"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cell", "rank", "cos_sim")
    )


def margin_topk_match(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Margin-based best-match mining between two embedding sets.

    The bitext-mining criterion (Artetxe & Schwenk, 2019, forward
    direction): for every source vector, the best target by cosine plus
    a margin score = cos(best) / mean(cos of the top-k neighbors). A
    margin near 1 means the best match is no better than the local
    neighborhood (unreliable alignment); mining keeps pairs above a
    margin threshold. The standard tool for mining parallel documents
    out of two monolingual corpora.

    Plan shape: same broadcast-queries cross join as cosine_topk (the
    source side is the small one; no corpus shuffle), one top-k window
    per source, then a per-source aggregate over <= k rows. Determinism
    contract: cosine rounded to 12 decimals BEFORE ranking (ties broken
    by tgt_id), top-k mean summed as DECIMAL(38,12), margin rounded to
    9 — bit-identical to the DuckDB twin.
    """
    q = _prepped(src, id_col, vec_col, "src_id", "q_vec")
    c = _prepped(tgt, id_col, vec_col, "tgt_id", "c_vec")
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cos_sim", F.round(_cos_pair("q_vec", "c_vec"), 12)
    )
    return _margin_from_scored(scored, k)


def _margin_from_scored(scored: DataFrame, k: int) -> DataFrame:
    """Shared margin tail: top-k window per source, then the per-source
    best/mean-of-top-k aggregate (determinism contract: cos already
    rounded to 12 before ranking; top-k mean summed as DECIMAL(38,12),
    margin rounded to 9)."""
    w = W.partitionBy("src_id").orderBy(F.desc("cos_sim"), F.asc("tgt_id"))
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    best_tgt = F.max(F.when(F.col("rank") == 1, F.col("tgt_id")))
    best_cos = F.max(F.when(F.col("rank") == 1, F.col("cos_sim")))
    avg_k = (
        F.sum(F.col("cos_sim").cast("decimal(38,12)")).cast("double")
        / F.count(F.lit(1))
    )
    return topk.groupBy("src_id").agg(
        best_tgt.alias("tgt_id"),
        best_cos.alias("cos_sim"),
        F.round(best_cos / avg_k, 9).alias("margin"),
    )


def margin_topk_match_blocked(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    n_cells: int = 8,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Corpus-scale bitext margin mining: IVF-cell-routed candidate
    generation instead of ``margin_topk_match``'s broadcast-source cross
    join.

    The broadcast form is right when the source side is a bounded query
    set; mining two *monolingual corpora* against each other makes both
    sides corpus-sized and a broadcast of either dies at 100x. Here the
    target corpus is IVF-indexed (seeded MLlib k-means codebook,
    ann_index.build_ivf_index), each source vector is routed to its
    ``nprobe`` nearest cells through the tiny broadcast codebook
    (n_cells rows — bounded regardless of corpus size), and matching is
    a cell-keyed EQUI-join: both sides shuffle-partition by cell, no
    corpus-sized broadcast, no cartesian. Per-cell work is
    O(|cell| * |sources routed to it|) — the SemDeDup blocking pattern
    applied to the margin criterion.

    With ``nprobe == n_cells`` every cell is probed and the result is
    EXACT (equal to margin_topk_match bit for bit — same rounding
    contract) while the plan stays shuffle-partitioned: that is the
    configuration the x122 oracle pins. At scale the knob drops to
    nprobe << n_cells, trading recall for a ~n_cells/nprobe cost cut on
    the standard IVF curve; synthetic uniform embeddings have no cluster
    structure for the codebook to exploit, so the exact setting is also
    the honest default here.
    """
    from .ann_index import build_ivf_index

    indexed, centroids = build_ivf_index(
        tgt, k=n_cells, vec_col=vec_col, id_col=id_col
    )
    return margin_topk_match_indexed(
        src, indexed, centroids, k=k, nprobe=nprobe, vec_col=vec_col,
        id_col=id_col,
    )


def margin_topk_match_indexed(
    src: DataFrame,
    indexed_tgt: DataFrame,
    centroids,
    k: int = 4,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``margin_topk_match_blocked``'s matching tail against a
    PREBUILT IVF index: ``indexed_tgt`` already carries its ``cell``
    column (ann_index.build_ivf_index / load_ivf_index) and
    ``centroids`` its codebook. This is the deployment shape — the
    k-means fit is paid once when the index is persisted
    (ann_index.save_ivf_index) and every mining run serves from it,
    instead of re-fitting the codebook per run. Exactness contract is
    unchanged: with ``nprobe`` == number of centroids every cell is
    probed and the output equals margin_topk_match bit for bit."""
    spark = indexed_tgt.sparkSession
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, cent_vec array<double>",
    ).withColumn("cent_vec_nrm", F.sqrt(dot(F.col("cent_vec"), F.col("cent_vec"))))

    q = _prepped(src, id_col, vec_col, "src_id", "q_vec")
    wq = W.partitionBy("src_id").orderBy(F.desc("cent_sim"), F.asc("cell"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cent_sim", _cos_pair("q_vec", "cent_vec"))
        .withColumn("cent_rank", F.row_number().over(wq))
        .filter(F.col("cent_rank") <= nprobe)
        .select("src_id", "q_vec", "cell")
    )
    # Round-13 (guide §4.2): per-cell scoring runs as a pandas COGROUP —
    # exact_cos_matrix reproduces the JVM fold's IEEE sequence exactly
    # (see its docstring), so each cell's cosines are bit-identical to
    # the old cell-keyed equi-join + interpreted per-pair fold. Each
    # cogroup emits only its cell's per-source top-k CANDIDATES (every
    # pair whose exact cosine is within 1e-9 of the cell's per-source
    # k-th largest): a pair in the GLOBAL top-k by (rounded cos desc,
    # tgt_id asc) is a fortiori in its own cell's top-k by the same
    # order, and rounded-order vs exact-order rank flips need values
    # within the 1e-12 rounding quantum — three orders inside the 1e-9
    # emit margin. Rounding to 12 then happens in the JVM on the emitted
    # rows (identical operands -> identical rounding), and the rank
    # window sees |src| x k x nprobe rows instead of every scored pair.
    tgt_sel = indexed_tgt.select(
        F.col(id_col).alias("tgt_id"), F.col(vec_col).alias("t_vec"),
        F.col("cell"),
    )
    kk = int(k)
    # derive the id dtype instead of hardcoding long (ADVICE r13): the
    # old equi-join plan preserved whatever id type the caller used
    id_t = dict(indexed_tgt.dtypes)[id_col]

    def score(src_pdf, tgt_pdf):
        import pandas as pd

        empty = pd.DataFrame(
            {
                "src_id": pd.Series([], dtype="int64"),
                "tgt_id": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        if not len(src_pdf) or not len(tgt_pdf):
            return empty
        sids = src_pdf["src_id"].to_numpy()
        tids = tgt_pdf["tgt_id"].to_numpy()
        S = np.stack(src_pdf["q_vec"].to_numpy()).astype(np.float64)
        T = np.stack(tgt_pdf["t_vec"].to_numpy()).astype(np.float64)
        nt = len(tids)
        chunk = max(1, (4 << 20) // max(nt, 1))
        out_s, out_t, out_c = [], [], []
        for s in range(0, len(sids), chunk):
            e = min(len(sids), s + chunk)
            C = exact_cos_matrix(S[s:e], T)
            if nt > kk:
                kth = np.partition(C, nt - kk, axis=1)[:, nt - kk]
                # Zero-norm semantics (ADVICE r13): the JVM plan this
                # replaced would have FAILED LOUDLY on a zero-norm
                # vector — under the session's ANSI mode double division
                # by zero raises DIVIDE_BY_ZERO, so "what the old plan
                # saw" is an error, never NaN. This kernel instead
                # defines the degenerate case: 0/0 -> NaN under
                # errstate-ignore, NaN sorts ABOVE every real value in
                # BOTH orderings involved (np.partition places NaN
                # last-ascending == largest, Spark's desc ranks NaN
                # first), so the per-source kth threshold and the emit
                # set stay mutually consistent: with m < k NaN targets
                # kth is the (k-m)-th largest real and real candidates
                # are emitted alongside every NaN pair; with m >= k the
                # top-k is all-NaN and exactly those rows are emitted.
                # No input in any declared dataset has a zero-norm
                # vector (the oracle would have raised), so declared
                # results are unaffected either way.
                mask = (C >= (kth[:, None] - 1e-9)) | np.isnan(C)
            else:
                mask = np.ones_like(C, dtype=bool)
            li, lj = np.nonzero(mask)
            out_s.append(sids[li + s])
            out_t.append(tids[lj])
            out_c.append(C[li, lj])
        import numpy as _np

        return pd.DataFrame(
            {
                "src_id": _np.concatenate(out_s),
                "tgt_id": _np.concatenate(out_t),
                "cos_sim": _np.concatenate(out_c).astype(_np.float64),
            }
        )

    scored = (
        tgt_sel.groupBy("cell")
        .cogroup(probes.groupBy("cell"))
        .applyInPandas(
            lambda t_pdf, s_pdf: score(s_pdf, t_pdf),
            schema=f"src_id {id_t}, tgt_id {id_t}, cos_sim double",
        )
        .withColumn("cos_sim", F.round("cos_sim", 12))
    )
    return _margin_from_scored(scored, k)


__all__ = [
    "cosine_topk",
    "lsh_ann_topk",
    "ivf_topk",
    "margin_topk_match",
    "margin_topk_match_blocked",
    "margin_topk_match_indexed",
]
