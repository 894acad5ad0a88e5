"""Multimodal plumbing: schema, Arrow batch shape, frame-sample explode.
Decode itself is a documented deterministic stub (no media libs here)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes([1, 2, 3, 4, 5, 6, 7, 8]), (640, 480, None, None, "png")),
        (2, "image", bytes([8, 7, 6, 5, 4, 3, 2, 1]), (800, 600, None, None, "jpeg")),
        (3, "audio", bytes(range(16)), (None, None, 44100, None, "wav")),
        (4, "video", bytes(range(8)), (1920, 1080, None, 95, "h264")),
    ]
    from rdf_indexer_spark.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_shape(spark, media):
    from rdf_indexer_spark.multimodal import extract_features

    out = extract_features(media.filter(F.col("kind") != "video"))
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3}
    for r in rows:
        assert r["feat_dim"] == len(r["feature"]) == 32
        assert all(isinstance(x, float) for x in r["feature"])


def test_feature_extraction_deterministic(spark, media):
    from rdf_indexer_spark.multimodal import extract_features

    imgs = media.filter(F.col("kind") == "image")
    a = {r["doc_id"]: r["feature"] for r in extract_features(imgs).collect()}
    b = {r["doc_id"]: r["feature"] for r in extract_features(imgs).collect()}
    assert a == b
    assert a[1] != a[2]  # different payload → different fake decode


def test_frame_sample_explode(spark, media):
    from rdf_indexer_spark.multimodal import frame_sample

    frames = frame_sample(media, every_n=10).collect()
    assert {r["frame_idx"] for r in frames} == set(range(0, 95, 10))
    assert all(r["doc_id"] == 4 for r in frames)


def test_resize_rewrites_meta(spark, media):
    from rdf_indexer_spark.multimodal import resize_images

    out = resize_images(media, 224, 224).collect()
    assert len(out) == 2
    for r in out:
        assert r["meta"]["width"] == 224 and r["meta"]["height"] == 224
        assert r["meta"]["codec"] in ("png", "jpeg")  # other meta preserved
