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

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import cosine

_SEED = 42


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-match excluded)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
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
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH bucket.

    With n_planes=4 (16 buckets), ~1/16 of the corpus is scored per query.
    Output schema matches cosine_topk; recall < 1 by design (rows-only
    correctness check + recall assertion in tests).
    """
    bucket = lambda col: _hyperplane_bucket(col, dim, n_planes)  # noqa: E731
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
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
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(cell_col).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cell", "rank", "cos_sim")
    )


__all__ = ["cosine_topk", "lsh_ann_topk", "ivf_topk"]
