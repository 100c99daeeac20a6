"""IVF index build + probe with a real k-means coarse quantizer (MLlib).

similarity.ivf_topk consumes a precomputed cell column; this module
builds that column the way a production vector store does:

1. ``build_ivf_index``: fit a k-means codebook (Spark MLlib — seeded,
   distributed) on the embedding corpus, assign every vector its nearest
   centroid cell, and write the corpus ``partitionBy(cell)`` so a probe
   touches only its cells' files.
2. ``probe_ivf``: assign each query to its ``nprobe`` nearest centroids
   (broadcast-codebook crossJoin + per-query window — fully distributed,
   no query collect), scan only those cells, score cosine, top-k per
   query.

Recall/cost trade is the standard IVF curve: nprobe cells of ~|corpus|/k
vectors each, vs the full corpus for brute force.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import dot
from .similarity import _cos_pair, _prepped

_SEED = 42


def _to_mllib_vectors(df: DataFrame, vec_col: str):
    from pyspark.ml.functions import array_to_vector

    return df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))


def build_ivf_index(
    corpus: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index_path: str | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Fit the codebook, assign cells; optionally persist partitionBy(cell).

    Returns (indexed corpus with a ``cell`` column, centroid matrix).
    The KMeans fit is the one genuinely iterative step — MLlib runs it as
    a sequence of distributed jobs; everything downstream is one pass.
    """
    from pyspark.ml.clustering import KMeans

    featured = _to_mllib_vectors(corpus, vec_col)
    km = KMeans(k=k, seed=_SEED, featuresCol="__features", predictionCol="cell")
    model = km.fit(featured)
    indexed = model.transform(featured).drop("__features")
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    if index_path:
        indexed.write.mode("overwrite").partitionBy("cell").parquet(index_path)
    return indexed, centroids


def probe_ivf(
    indexed: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine within each query's nprobe nearest cells.

    Query->cell assignment is DISTRIBUTED: the tiny codebook (k rows)
    broadcasts, each query row cross-joins it map-side, and a per-query
    window keeps the nprobe nearest centroids — no collect() of the
    query frame, so probing scales to query *streams*, not just ad-hoc
    sets. The (query, cell) probe list then joins the cell-partitioned
    corpus — partition pruning does the rest when the index is read from
    its partitionBy(cell) layout.
    """
    spark = indexed.sparkSession
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, cent_vec array<double>",
    ).withColumn("cent_vec_nrm", F.sqrt(dot(F.col("cent_vec"), F.col("cent_vec"))))

    q = _prepped(queries, id_col, vec_col, "query_id", "q_vec")
    wq = W.partitionBy("query_id").orderBy(F.desc("cent_sim"), F.asc("cell"))
    probe_df = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cent_sim", _cos_pair("q_vec", "cent_vec"))
        .withColumn("cent_rank", F.row_number().over(wq))
        .filter(F.col("cent_rank") <= nprobe)
        .select("query_id", "cell")
    )
    c = _prepped(indexed, id_col, vec_col, "neighbor_id", "c_vec",
                 extra={"cell": "cell"})
    scored = (
        c.join(F.broadcast(probe_df), "cell")
        .join(F.broadcast(q), "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", _cos_pair("q_vec", "c_vec"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
