"""Multimodal plumbing: schemas, batch shapes, determinism of the
stubbed decode path."""

from __future__ import annotations

import numpy as np

from geo_spark.operators.multimodal import (
    audio_features,
    image_features,
    partitions_for_bytes,
    synth_media,
    video_frame_sample,
)


def test_media_pipeline_shapes(spark):
    media = synth_media(spark, 30, partitions=4)
    media.cache()
    assert media.count() == 30
    kinds = dict(media.groupBy("kind").count().collect())
    assert kinds == {"image": 10, "audio": 10, "video": 10}

    img = image_features(media, resize_to=4).collect()
    assert len(img) == 10
    for r in img:
        assert len(r["thumb"]) == 16
        assert 0 <= r["mean_px"] <= 255

    aud = audio_features(media).collect()
    assert len(aud) == 10
    assert all(len(r["band_energy"]) == 4 for r in aud)
    assert all(r["n_samples"] == 256 for r in aud)

    vid = video_frame_sample(media, every=4).collect()
    # 12 frames sampled every 4 -> 3 rows per video
    assert len(vid) == 30
    assert {r["frame_idx"] for r in vid} == {0, 4, 8}


def test_media_determinism(spark):
    a = {
        (r["media_id"], tuple(r["thumb"]))
        for r in image_features(synth_media(spark, 12, 2)).collect()
    }
    b = {
        (r["media_id"], tuple(r["thumb"]))
        for r in image_features(synth_media(spark, 12, 5)).collect()
    }
    assert a == b  # partition-count independent


def test_partitions_for_bytes():
    assert partitions_for_bytes(0) == 1
    assert partitions_for_bytes(512 * 1024 * 1024, 128) == 4


def test_bmp_round_trip_and_padding():
    from geo_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for w, h in [(1, 1), (2, 3), (5, 4), (32, 24)]:  # odd widths pad
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (w, h)


def test_bmp_top_down_rows():
    import struct

    from geo_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (4, 3, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    # flip the height sign to declare top-down, and reorder the rows
    struct.pack_into("<i", data, 22, -4)
    stride = (3 * 3 + 3) // 4 * 4
    body = bytes(data[54:])
    rows = [body[i * stride : (i + 1) * stride] for i in range(4)]
    data[54:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(data)), img)


def test_ppm_round_trip():
    from geo_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_decode_image_real_bmp_grayscale():
    from geo_spark.operators.multimodal import decode_image, encode_bmp

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = (255, 0, 0)
    img[0, 1] = (0, 255, 0)
    img[1, 0] = (0, 0, 255)
    img[1, 1] = (30, 60, 90)
    gray = decode_image(encode_bmp(img), 2, 2)
    want = np.array([[255 // 3, 255 // 3], [255 // 3, 180 // 3]], dtype=np.uint8)
    assert np.array_equal(gray, want)


def test_image_features_on_real_bmp(spark):
    """The media pipeline now decodes an ACTUAL file format end to end:
    feature stats must equal numpy on the decoded raster."""
    from geo_spark.operators.multimodal import decode_image, synth_media

    media = synth_media(spark, 9, partitions=3)
    rows = {
        r["media_id"]: r["payload"]
        for r in media.where("kind = 'image'").collect()
    }
    feats = {
        r["media_id"]: (r["mean_px"], r["std_px_x1000"])
        for r in image_features(media).collect()
    }
    assert set(feats) == set(rows)
    for mid, payload in rows.items():
        gray = decode_image(bytes(payload), 32, 24)
        assert gray.shape == (24, 32)
        assert feats[mid][0] == float(gray.mean())
        assert feats[mid][1] == int(gray.std() * 1000)
