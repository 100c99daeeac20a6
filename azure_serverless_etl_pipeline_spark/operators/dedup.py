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
- The inverted-index Jaccard join is quadratic in per-shingle frequency;
  ``max_shingle_freq`` drops ubiquitous shingles (stop-shingles), the
  standard guard against join skew at scale.
- Verification joins re-fetch only candidate pairs (semi-join pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cosine, tokens, word_shingles

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
    """(id, shingle) inverted index — distinct word n-grams per doc."""
    return df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard >= threshold, via inverted index.

    Jaccard is a ratio of integers -> bit-exact across engines, so this one
    carries a full SQL oracle. ``max_shingle_freq`` caps the per-shingle
    posting list (skew guard); None keeps exactness for the oracle.
    """
    sh = shingle_table(df, text_col, id_col, n)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(freq.filter(F.col("df") <= max_shingle_freq), "shingle").drop("df")
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
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _minhash_signature(shingles_col, num_perm: int):
    """array<long> minhash signature: one xxhash64 family member per perm.

    Pure array expressions — evaluated map-side inside codegen, no UDF.
    """
    def perm_min(i: int):
        # closure, not a lambda default arg — PySpark reads a 2-arg lambda
        # as the (value, index) higher-order-function form
        return F.array_min(
            F.transform(shingles_col, lambda s: F.xxhash64(F.lit(_SEED + i), s))
        )

    return F.array(*[perm_min(i) for i in range(num_perm)])


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    rows_per_band = num_perm // bands; with 64 perms / 32 bands (r=2),
    candidate recall at J=0.5 is 1-(1-0.25)^32 ~ 0.9999. Candidates are
    then verified exactly, so precision is 1.0 by construction; output is
    LSH-recall-limited (hence no SQL oracle — driver does rows-only).
    """
    r = num_perm // bands
    base = df.select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("shingles")
    ).filter(F.size("shingles") > 0)
    sig = base.withColumn("sig", _minhash_signature(F.col("shingles"), num_perm))

    # band hash: xxhash64 over the band's slice of the signature
    banded = sig.select(
        id_col,
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(F.slice("sig", bi * r + 1, r)).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "shingles", "bb.band", "bb.bucket")

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = cand.withColumn(
        "jaccard",
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
    ).filter(F.col("jaccard") >= threshold)
    return verified.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _simhash_bits(tokens_col, bits: int = 64):
    """Signed bit-vote fold: array<int>[bits] of sum(+-1) per bit position."""
    zero = F.array_repeat(F.lit(0), bits)
    # bit i of the token hash as +1/-1; bit 63's mask is the sign bit, which
    # only fits a signed long as the negative two's-complement value
    masks = [(1 << i) if i < 63 else -(1 << 63) for i in range(bits)]

    def contrib(t):
        h = F.xxhash64(F.lit(_SEED), t)
        return F.array(
            *[
                F.when(h.bitwiseAND(F.lit(m)) != 0, F.lit(1)).otherwise(F.lit(-1))
                for m in masks[:bits]
            ]
        )

    return F.aggregate(
        tokens_col, zero, lambda acc, t: F.zip_with(acc, contrib(t), lambda x, y: x + y)
    )


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
    """
    chunk = bits // blocks
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    sig = base.select(
        id_col, _simhash_bits(F.col("toks"), bits).alias("votes")
    ).select(
        id_col,
        F.transform(
            F.col("votes"), lambda v: F.when(v > 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("bitsig"),
    )
    blocked = sig.select(
        id_col,
        "bitsig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("blk"),
                        F.concat_ws(
                            "", *[F.element_at("bitsig", bi * chunk + j + 1) for j in range(chunk)]
                        ).alias("chunk"),
                    )
                    for bi in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bitsig", "bb.blk", "bb.chunk")
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.bitsig").alias("sig_a"),
            F.col("b.bitsig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
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
    standard scale path for embedding dedup. Cosine is computed as a
    sequential double fold (bit-identical to the DuckDB oracle).
    """
    cols = [id_col, vec_col] + ([block_col] if block_col else [])
    e = df.select(*cols)
    a, b = e.alias("a"), e.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")) & cond
    sim = cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    out = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        *([F.col(f"a.{block_col}").alias(block_col)] if block_col else []),
        sim.alias("cos_sim"),
    )
    return out.filter(F.col("cos_sim") >= threshold)
