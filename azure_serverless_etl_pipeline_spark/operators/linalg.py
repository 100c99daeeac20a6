"""Distributed linear algebra over embedding columns.

``embedding_covariance`` computes the exact d x d covariance of an
array<float> column in ONE map-side pass: the d(d+1)/2 upper-triangle
index grid (2080 rows at d=64) broadcasts and fans every vector out
via a bounded nested-loop join — no self-join of the corpus, no
shuffle of vectors, and a plan whose size is independent of d (an
inline literal of 2080 struct expressions was measured to blow the
driver heap during codegen) — then a single grouped aggregation
reduces the cells. Products are exact IEEE doubles and the reduction
sums DECIMAL(38,18), so the result is order-independent and
bit-identical to the DuckDB oracle — unlike ml.stat.Summarizer, whose
float partial merges are partition-order dependent (fine for
training, useless for a hash-checked contract).

The covariance (and the whitening/PCA that follows from it on the
driver — d x d is tiny) is the standard preprocessing step before
embedding dedup/retrieval: SemDeDup-style pipelines whiten before
cosine so one dominant direction doesn't swamp similarity.

Scale: the exact path's emitted rows are |corpus| * d(d+1)/2 — a
2080x fan-out of the dominant scan at d=64, which is the plan's cost
at any corpus size. ``embedding_covariance_gemm`` is therefore the
DEFAULT at scale: one mapInPandas pass computes per-partition numpy
``X^T X`` partials (d x d floats per partition — the emitted frame is
2080 rows PER PARTITION, independent of |corpus|), and one tiny
grouped reduce merges them. The price is float partial-sum merge
order (not bit-reproducible across partitionings), so the exact
decimal path stays registered as its oracle twin — the same
exact/approx contrast as x71/x78 — and pytest pins gemm==exact to a
one-quantum tolerance.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(
    df: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    quant: int = 9,
) -> DataFrame:
    """(i, j, n, cov) for 1 <= i <= j <= dim: cov = E[xi*xj] - E[xi]E[xj]
    (population covariance), quantized floor(x*10^quant + 0.5)/10^quant
    — the tie-proof grid convention shared with x86/x110."""
    spark = df.sparkSession
    grid = (
        spark.range(1, dim + 1)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(spark.range(1, dim + 1).select(F.col("id").cast("int").alias("j")))
        .filter(F.col("i") <= F.col("j"))
    )
    xi = F.element_at(F.col(vec_col), F.col("i")).cast("double")
    xj = F.element_at(F.col(vec_col), F.col("j")).cast("double")
    cells = (
        df.select(vec_col)
        .crossJoin(F.broadcast(grid))
        .select(
            "i",
            "j",
            (xi * xj).cast("decimal(38,18)").alias("p"),
            xi.cast("decimal(38,18)").alias("xi"),
            xj.cast("decimal(38,18)").alias("xj"),
        )
    )
    agg = cells.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").cast("double").alias("sp"),
        F.sum("xi").cast("double").alias("sxi"),
        F.sum("xj").cast("double").alias("sxj"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sp") / n - (F.col("sxi") / n) * (F.col("sxj") / n)
    q = F.lit(float(10**quant))
    return agg.select(
        "i",
        "j",
        "n",
        (F.floor(cov * q + F.lit(0.5)) / q).alias("cov"),
    )


def embedding_covariance_gemm(
    df: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    quant: int = 9,
) -> DataFrame:
    """Same (i, j, n, cov) contract as ``embedding_covariance``, computed
    the way a 100 TB corpus must: per-partition numpy GEMM partials via
    mapInPandas (Arrow-batched, no per-row Python), one 2080-key reduce.

    Each partition emits ONE upper-triangle frame (d(d+1)/2 rows of
    float64 partial sums) regardless of how many vectors it holds — the
    shuffle is O(partitions * d^2) bytes, vs the exact path's
    O(|corpus| * d^2) row fan-out. Per-element products are identical
    IEEE doubles in both paths; only the partial-sum merge order
    differs, so gemm == exact to one 10^-quant quantum (pytest-pinned),
    while the exact path keeps the bit-reproducible driver hash.
    """
    import numpy as np
    import pandas as pd

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        prod = np.zeros((dim, dim), dtype=np.float64)
        sums = np.zeros(dim, dtype=np.float64)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            prod += x.T @ x
            sums += x.sum(axis=0)
            n += x.shape[0]
        if n == 0:
            return
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": (iu + 1).astype("int32"),
                "j": (ju + 1).astype("int32"),
                "n": np.full(iu.size, n, dtype="int64"),
                "sp": prod[iu, ju],
                "sxi": sums[iu],
                "sxj": sums[ju],
            }
        )

    part = df.select(vec_col).mapInPandas(
        partials, schema="i int, j int, n long, sp double, sxi double, sxj double"
    )
    agg = part.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum("sp").alias("sp"),
        F.sum("sxi").alias("sxi"),
        F.sum("sxj").alias("sxj"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sp") / n - (F.col("sxi") / n) * (F.col("sxj") / n)
    q = F.lit(float(10**quant))
    return agg.select(
        "i",
        "j",
        "n",
        (F.floor(cov * q + F.lit(0.5)) / q).alias("cov"),
    )


def embedding_spectrum(
    df: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Top-k eigenvalues of the corpus covariance + explained-variance
    ratios — the embedding-quality diagnostic (anisotropy / effective
    intrinsic dimension: one dominant direction means cosine similarity
    is mostly measuring that direction, and SemDeDup-style pipelines
    whiten first for exactly this reason).

    Scale shape: the corpus contributes only the GEMM-partial pass
    (``embedding_covariance_gemm`` — O(partitions * d^2) shuffle); the
    eigendecomposition runs on the collected d x d matrix, a bounded
    driver-side artifact like the k-means centroids or the PQ codebook.
    Output: (component, eigenvalue, explained_var, cum_explained),
    floats -> rows-only contract, numpy-parity pytest."""
    import numpy as np

    cells = embedding_covariance_gemm(df, dim=dim, vec_col=vec_col).collect()
    cov = np.zeros((dim, dim), dtype=np.float64)
    for r in cells:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov"]
    evals = np.linalg.eigvalsh(cov)[::-1]  # symmetric -> real, desc
    total = float(evals.sum())
    top = evals[:k]
    rows = []
    cum = 0.0
    for i, ev in enumerate(top):
        cum += float(ev) / total
        rows.append(
            (
                i + 1,
                round(float(ev), 9),
                round(float(ev) / total, 9),
                round(cum, 9),
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "component int, eigenvalue double, explained_var double, "
        "cum_explained double",
    )


__all__ = [
    "embedding_covariance",
    "embedding_covariance_gemm",
    "embedding_spectrum",
]
