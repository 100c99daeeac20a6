"""Contrastive triplet mining for embedding-model training.

Turns the near-dup pair stream into (anchor, positive, negative)
triplets — the training examples for contrastive / metric-learning
objectives (SimCSE-style). Positives are the near-dup pairs themselves;
negatives are mined WITHIN the same coarse cell (label), which makes
them HARD negatives (same neighborhood, not a duplicate) — the
in-batch-negative trick expressed as a deterministic dataset transform
instead of a training-loop accident.

Negative assignment is circular-shift: within each cell, pair i takes
pair (i+1 mod n_pairs)'s positive as its negative, falling back to
(i+2 mod n_pairs) when the shifted candidate collides with the
anchor/positive, dropping the (rare) row if both collide. Expressed as
rank + modular self-joins on (cell, index) — no global window, no RNG;
bit-reproducible anywhere, so the triplet set is stable across reruns
and engines (the property that makes dataset versioning meaningful).

Both similarity columns travel with the triplet (cos_pos from the pair
stream, cos_neg computed against the mined negative) so downstream
curricula can filter by margin (cos_pos - cos_neg) without touching
the vectors again.

Scale shape: two modular equi-joins on (cell, idx) + one vector join to
fetch the negative's embedding — all shuffles keyed by cell or id; the
pair stream is ranked per-cell (distributed window), never globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions import cosine


def mine_triplets(
    pairs: DataFrame,
    embeddings: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(anchor, positive, negative, cell, cos_pos, cos_neg) per pair.

    ``pairs`` must carry (id_a, id_b, ``cell_col``, cos_sim) — the
    embedding_near_dup output shape. Rows whose cell has one pair (no
    usable shifted candidate) are dropped.
    """
    # The cyclic shift is pure WINDOW arithmetic over one per-cell sort:
    # cand1 (index (rn mod n)+1) is lead(1) with a wrap to the cell's
    # first row, cand2 (index ((rn+1) mod n)+1) is lead(2) with the two
    # wrap cases spelled out. The former rank + count-join + two modular
    # self-joins re-executed the (expensive) pair-mining subtree four
    # times and shuffled it twice more; this shape evaluates ``pairs``
    # ONCE and reuses the single (cell)-partitioned exchange for every
    # window column (r13 opt; bit-identical output — the modular index
    # algebra is unchanged, only its physical form).
    w = W.partitionBy("cell").orderBy("anchor", "positive")
    wcell = W.partitionBy("cell")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = (
        pairs.select(
            F.col("id_a").alias("anchor"),
            F.col("id_b").alias("positive"),
            F.col(cell_col).alias("cell"),
            F.col("cos_sim").alias("cos_pos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_pairs", F.count(F.lit(1)).over(wcell))
        .withColumn(
            "cand1",
            F.coalesce(
                F.lead("positive", 1).over(w), F.first("positive").over(wfull)
            ),
        )
        .withColumn(
            "cand2",
            F.when(
                F.col("rn") <= F.col("n_pairs") - 2,
                F.lead("positive", 2).over(w),
            )
            .when(
                F.col("rn") == F.col("n_pairs") - 1,
                F.first("positive").over(wfull),
            )
            .otherwise(F.nth_value("positive", 2).over(wfull)),
        )
    )
    picked = (
        ranked.withColumn(
            "negative",
            F.when(
                (F.col("cand1") != F.col("anchor"))
                & (F.col("cand1") != F.col("positive")),
                F.col("cand1"),
            ).when(
                (F.col("cand2") != F.col("anchor"))
                & (F.col("cand2") != F.col("positive")),
                F.col("cand2"),
            ),
        )
        .where(F.col("negative").isNotNull())
    )
    av = embeddings.select(
        F.col(id_col).alias("anchor"), F.col(vec_col).alias("a_vec")
    )
    nv = embeddings.select(
        F.col(id_col).alias("negative"), F.col(vec_col).alias("n_vec")
    )
    return (
        picked.join(av, "anchor")
        .join(nv, "negative")
        .select(
            "anchor",
            "positive",
            "negative",
            F.col("cell"),
            "cos_pos",
            F.round(cosine(F.col("a_vec"), F.col("n_vec")), 12).alias("cos_neg"),
        )
    )
