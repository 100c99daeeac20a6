"""Multimodal plumbing: schemas, Arrow batching, byte-based partitioning,
deterministic stub decode/featurize."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake image bytes", "image/png", None, None, None),
        (2, "audio", b"RIFF fake wav bytes xx", "audio/wav", None, None, 2_500),
        (3, "video", b"\x00\x00ftyp fake mp4 bytes", "video/mp4", None, None, 3_500),
        (4, "image", b"", "image/png", None, None, None),  # empty blob
    ]
    from azure_serverless_etl_pipeline_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_schema_and_determinism(spark, media):
    from azure_serverless_etl_pipeline_spark.operators.multimodal import decode_media

    out = decode_media(media).toPandas().set_index("media_id").sort_index()
    assert list(out.columns) == ["kind", "width", "height", "n_channels", "decode_ok"]
    assert bool(out.loc[4, "decode_ok"]) is False  # empty blob -> failed decode
    assert out.loc[[1, 2, 3], "decode_ok"].all()
    # deterministic: same input -> same metadata
    again = decode_media(media).toPandas().set_index("media_id").sort_index()
    assert out.equals(again)


def test_feature_extraction_shape(spark, media):
    from azure_serverless_etl_pipeline_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    feats = extract_features(media).toPandas()
    assert len(feats) == 4
    for v in feats["feature"]:
        assert len(v) == FEATURE_DIM
    import numpy as np

    norms = [np.linalg.norm(v) for v in feats["feature"] if np.any(v)]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)  # L2-normalized


def test_media_repartition_by_bytes(spark, media):
    from azure_serverless_etl_pipeline_spark.operators.multimodal import (
        media_repartition,
    )

    # tiny target -> partitions driven by byte volume, not row count
    out = media_repartition(media, target_bytes=16)
    assert out.rdd.getNumPartitions() >= 4
    assert out.count() == 4


def test_frame_sample(spark, media):
    from azure_serverless_etl_pipeline_spark.operators.multimodal import frame_sample

    frames = frame_sample(media, every_ms=1000).toPandas()
    # only the video row expands; 3500ms @ 1s -> ts 0,1000,2000,3000
    assert set(frames["media_id"]) == {3}
    assert frames["frame_ts_ms"].tolist() == [0, 1000, 2000, 3000]
