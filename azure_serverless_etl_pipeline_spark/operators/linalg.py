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

Scale: the emitted rows are |corpus| * d(d+1)/2 — at extreme corpus
sizes swap the exact reduction for per-partition numpy GEMM partials
(mapInPandas) and accept float merge order; the contract here keeps
the exact path because the driver hash-checks it.
"""

from __future__ import annotations

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


__all__ = ["embedding_covariance"]
