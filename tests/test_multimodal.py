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
