"""Multimodal plumbing: schemas, batch shapes, determinism of the
stubbed decode path."""

from __future__ import annotations

import numpy as np
import pytest

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


def test_png_round_trip_all_filters():
    """Every PNG scanline filter type must survive encode -> decode
    bit-exactly (this is what certifies the decoder's unfilter paths,
    including the sequential Average/Paeth lanes)."""
    from geo_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(91)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    for ft in range(5):
        data = encode_png(img, filter_type=ft)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        out = decode_png(data)
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, img, err_msg=f"filter {ft}")


def test_png_grayscale_color_type_0():
    from geo_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(17)
    gray = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    out = decode_png(encode_png(gray, filter_type=2))
    assert out.shape == (9, 11, 3)
    np.testing.assert_array_equal(out[..., 0], gray)
    np.testing.assert_array_equal(out[..., 1], gray)


def test_png_rgba_alpha_dropped():
    """Hand-built color-type-6 (RGBA) file: alpha is parsed past and
    dropped."""
    import struct
    import zlib

    from geo_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    lines = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(data), rgba[..., :3])


def test_png_bad_crc_raises():
    from geo_spark.operators.multimodal import decode_png, encode_png

    data = bytearray(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))
    data[20] ^= 0xFF  # corrupt a byte inside IHDR payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_decode_image_dispatches_png():
    from geo_spark.operators.multimodal import decode_image, encode_png

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    gray = decode_image(encode_png(img, filter_type=4), 7, 6)
    want = (img.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    np.testing.assert_array_equal(gray, want)


def test_gif_round_trip():
    from geo_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(41)
    # constrained palette (<=256 colors): quantized random raster
    img = (rng.integers(0, 4, (15, 21, 3)) * 80).astype(np.uint8)
    data = encode_gif(img)
    assert data[:6] == b"GIF89a" and data[-1:] == b"\x3b"
    np.testing.assert_array_equal(decode_gif(data), img)


def test_gif_interlaced_round_trip():
    from geo_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(43)
    img = (rng.integers(0, 8, (23, 9, 3)) * 30).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_gif(encode_gif(img, interlace=True)), img
    )


def test_gif_lzw_dictionary_growth():
    """A big low-entropy image forces code-width growth and (via the
    4096 cap) dictionary resets inside one stream."""
    from geo_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(47)
    img = (rng.integers(0, 2, (120, 130, 3)) * 255).astype(np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_gif_too_many_colors_raises():
    from geo_spark.operators.multimodal import encode_gif

    rng = np.random.default_rng(49)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_decode_image_dispatches_gif():
    from geo_spark.operators.multimodal import decode_image, encode_gif

    rng = np.random.default_rng(53)
    img = (rng.integers(0, 5, (8, 9, 3)) * 60).astype(np.uint8)
    gray = decode_image(encode_gif(img), 9, 8)
    want = (img.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    np.testing.assert_array_equal(gray, want)


def test_wav_round_trip():
    from geo_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(61)
    s = rng.integers(-32768, 32768, 500).astype(np.int16)
    rate, out = decode_wav(encode_wav(s, 22050))
    assert rate == 22050
    np.testing.assert_array_equal(out, s)
    with pytest.raises(ValueError, match="WAVE"):
        decode_wav(b"RIFFxxxxJUNK")


def test_avi_mjpeg_round_trip_and_stride():
    from geo_spark.operators.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    frames = [
        np.full((16, 16, 3), 30 * i, dtype=np.uint8) for i in range(8)
    ]
    data = encode_avi_mjpeg(frames, fps=5)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    got = decode_avi_mjpeg(data, every=3)
    assert [i for i, _ in got] == [0, 3, 6]
    for i, f in got:
        assert f.shape == (16, 16, 3)
        assert abs(float(f.mean()) - 30 * i) <= 3, i


def test_audio_video_features_on_real_containers(spark):
    """The fixture table now carries real WAV + MJPEG-AVI payloads; the
    feature operators must take the real-decode branch and match a
    local decode of the same payloads."""
    from geo_spark.operators.multimodal import (
        decode_avi_mjpeg,
        decode_wav,
    )

    media = synth_media(spark, 12, partitions=3)
    rows = {r["media_id"]: r for r in media.collect()}
    aud = {r["media_id"]: r for r in audio_features(media).collect()}
    for mid, r in rows.items():
        if r["kind"] != "audio":
            continue
        _, samples = decode_wav(bytes(r["payload"]))
        assert aud[mid]["n_samples"] == len(samples) == 256
    vid = {}
    for r in video_frame_sample(media, every=4).collect():
        vid.setdefault(r["media_id"], {})[r["frame_idx"]] = r["frame_mean"]
    for mid, r in rows.items():
        if r["kind"] != "video":
            continue
        want = {
            fi: float(f.mean())
            for fi, f in decode_avi_mjpeg(bytes(r["payload"]), every=4)
        }
        assert vid[mid] == want and set(want) == {0, 4, 8}


def test_audio_integer_features_exact(spark):
    import numpy as np

    from geo_spark.operators.multimodal import (
        audio_integer_features,
        encode_wav,
    )

    rng = np.random.default_rng(3)
    rows = []
    want = {}
    for i in range(6):
        s = rng.integers(-500, 500, 48).astype(np.int16)
        rows.append((i, bytearray(encode_wav(s, 8000))))
        v = s.astype(np.int64)
        want[i] = (
            len(v),
            int((v * v).sum()),
            int(np.abs(v).max()),
            int((v[:-1] * v[1:] < 0).sum()),
        )
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (
            r["n_samples"],
            r["sum_sq"],
            r["max_abs"],
            r["zero_cross"],
        )
        for r in audio_integer_features(df).collect()
    }
    assert got == want
