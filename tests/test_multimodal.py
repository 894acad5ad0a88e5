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


# ---------------------------------------------------------------------------
# r2: REAL pure-numpy decoders (PPM / BMP / WAV) — exact pixel/sample checks
# ---------------------------------------------------------------------------

def _ppm_bytes(img):
    import numpy as np

    h, w = img.shape[:2]
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + np.asarray(
        img, dtype=np.uint8
    ).tobytes()


def _bmp_bytes(img, top_down=False):
    """Minimal 24-bit BI_RGB BMP writer (BGR, 4-byte padded rows)."""
    import numpy as np

    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = np.asarray(img, dtype=np.uint8)[:, :, ::-1]
    order = bgr if top_down else bgr[::-1]
    rows[:, : w * 3] = order.reshape(h, w * 3)
    pixel_data = rows.tobytes()
    off = 14 + 40
    header = (
        b"BM" + (off + len(pixel_data)).to_bytes(4, "little") + b"\0\0\0\0"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h if top_down else h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(pixel_data).to_bytes(4, "little")
        + b"\0" * 16
    )
    return header + pixel_data


def _wav_bytes(samples, rate=8000, channels=1):
    import numpy as np

    pcm = (np.asarray(samples) * 32768.0).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * 2).to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def test_decode_ppm_exact():
    import numpy as np

    from rdf_indexer_spark.multimodal import decode_ppm

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_ppm(_ppm_bytes(img)) == img).all()


def test_decode_bmp_exact_bottom_up_and_top_down():
    import numpy as np

    from rdf_indexer_spark.multimodal import decode_bmp

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_bmp(_bmp_bytes(img)) == img).all()
    assert (decode_bmp(_bmp_bytes(img, top_down=True)) == img).all()


def test_decode_wav_exact():
    import numpy as np

    from rdf_indexer_spark.multimodal import decode_wav

    samples = np.array([0.0, 0.5, -0.5, 0.25])
    got, rate = decode_wav(_wav_bytes(samples, rate=16000))
    assert rate == 16000 and got.shape == (4, 1)
    assert np.allclose(got.reshape(-1), samples, atol=1 / 32768)


def test_ppm_roundtrip_and_resize():
    import numpy as np

    from rdf_indexer_spark.multimodal import (
        decode_ppm, encode_ppm, resize_nearest,
    )

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert (small == img[::2][:, ::2]).all()


def test_extract_features_real_image(spark):
    import numpy as np

    from rdf_indexer_spark.multimodal import extract_features

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    media = spark.createDataFrame(
        [(1, "image", bytearray(_ppm_bytes(img)),
          (3, 2, None, None, "ppm"))],
        "doc_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
    )
    row = extract_features(media).collect()[0]
    expected = (img.reshape(-1)[:32].astype(np.float32) / 255.0)
    assert np.allclose(row["feature"], expected)


def test_resize_images_real_payload(spark):
    import numpy as np

    from rdf_indexer_spark.multimodal import decode_ppm, resize_images

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    media = spark.createDataFrame(
        [(1, "image", bytearray(_bmp_bytes(img)), (4, 4, None, None, "bmp"))],
        "doc_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>",
    )
    row = resize_images(media, 2, 2).collect()[0]
    assert row["meta"]["codec"] == "ppm"
    out = decode_ppm(bytes(row["payload"]))
    assert (out == img[::2][:, ::2]).all()


def test_truncated_payloads_fall_back_to_stub_not_task_failure(spark):
    """VERDICT r3 item 4 regression: a truncated/malformed P6/BM/RIFF
    payload raised out of the decoder in r2 and killed the whole
    mapInPandas task; now it must fall back to the deterministic stub,
    exactly like an unknown codec (multimodal.decode_media)."""
    import numpy as np

    from rdf_indexer_spark.multimodal import (MEDIA_SCHEMA, _decode_stub,
                                              decode_media, extract_features)

    trunc_ppm = b"P6\n4 4\n255\n" + b"\x01" * 5   # header promises 48 bytes
    trunc_bmp = b"BM" + b"\x00" * 20              # header cut short
    trunc_wav = b"RIFF\x10\x00\x00\x00WAVE"       # RIFF with no fmt/data
    cases = [(trunc_ppm, "image"), (trunc_bmp, "image"), (trunc_wav, "audio")]
    for payload, kind in cases:
        arr = decode_media(payload, kind)
        np.testing.assert_array_equal(arr, _decode_stub(payload, kind))

    # through the Spark kernel: bad rows must not fail the task, and good
    # rows in the same batch still decode for real
    from rdf_indexer_spark.multimodal import encode_ppm

    good = encode_ppm(np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3))
    media = spark.createDataFrame(
        [(1, "image", bytearray(trunc_ppm), None),
         (2, "image", bytearray(trunc_bmp), None),
         (3, "audio", bytearray(trunc_wav), None),
         (4, "image", bytearray(good), None)],
        MEDIA_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(rows[i]["feat_dim"] > 0 for i in rows)
    # the intact payload really decoded (first 32 normalized pixels)
    want = (np.arange(4 * 4 * 3, dtype=np.float32) / 255.0)[:32]
    np.testing.assert_allclose(list(rows[4]["feature"]), want, rtol=1e-6)
