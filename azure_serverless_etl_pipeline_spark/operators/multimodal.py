"""Multimodal (image/audio/video) column operators.

North-star requirement: treat media as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``. The real decode step needs codec libraries absent from
this container, so decode is STUBBED behind an import-try with a
deterministic fake (documented below); everything Spark-side — schema,
batching, partition sizing, UDF signatures — is real and tested.

Scale notes (100 TB of media):
- ``mapInPandas`` streams Arrow batches; peak executor memory is one
  batch of decoded frames, not one partition. ``media_repartition``
  sizes partitions by BYTES (sum of blob lengths), not row count —
  row-count partitioning puts 100 4K videos next to 100 thumbnails and
  skews the stage.
- Feature extraction emits fixed-length float arrays — the embedding
  column shape the similarity/dedup operators consume downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover — not installed in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_channels int, "
    "decode_ok boolean"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, feature array<float>"  # noqa: F541


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic decode stub: derives (width, height, channels) from
    the blob bytes. Replace with PIL/ffmpeg in a full deployment —
    signature and batch shape are identical."""
    if not content:
        raise ValueError("empty media blob")
    h = int.from_bytes(content[:8].ljust(8, b"\0"), "little")
    return 16 + h % 1024, 16 + (h >> 10) % 1024, 1 + (h >> 20) % 4


def decode_media(df: DataFrame) -> DataFrame:
    """binary -> decoded metadata via mapInPandas (Arrow batches).

    With PIL present the stub body is swapped for a real Image.open;
    the deterministic fake keeps the distributed plumbing testable here.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": [],
                "height": [],
                "n_channels": [],
                "decode_ok": [],
            }
            for content in pdf["content"]:
                try:
                    if HAVE_PIL:  # pragma: no cover
                        raise NotImplementedError(
                            "real decode path requires codec plumbing"
                        )
                    w, h, c = _fake_decode(bytes(content) if content else b"")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_channels"].append(c)
                    out["decode_ok"].append(True)
                except Exception:
                    out["width"].append(0)
                    out["height"].append(0)
                    out["n_channels"].append(0)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """binary -> fixed-length float feature vector (vectorized numpy).

    Stub featurizer: byte-histogram folded to ``dim`` buckets, L2
    normalized — deterministic stand-in for a CNN/audio embedding with
    the same output column shape (array<float>).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for content in pdf["content"]:
                arr = np.frombuffer(
                    bytes(content) if content else b"\0", dtype=np.uint8
                )
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                nrm = np.linalg.norm(hist)
                feats.append((hist / nrm if nrm > 0 else hist).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(batches, f"media_id long, feature array<float>")  # noqa: F541


def media_repartition(df: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition media rows by cumulative blob size, not row count.

    Computes total bytes in one cheap agg and picks ceil(total/target)
    partitions; a salt column spreads large blobs. This is the knob that
    keeps a decode stage's batches memory-bounded at 100 TB.
    """
    total = df.select(
        F.sum(F.coalesce(F.length("content"), F.lit(0))).alias("b")
    ).collect()[0]["b"] or 0
    n = max(1, -(-int(total) // target_bytes))
    return df.repartition(n, F.xxhash64("media_id"))


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> frame-timestamp expansion (plumbing for frame-level ops).

    Emits one row per sampled timestamp via sequence/explode — pure
    column ops; the actual frame grab happens in a subsequent
    decode_media-style UDF in a real deployment.
    """
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms")
    )
