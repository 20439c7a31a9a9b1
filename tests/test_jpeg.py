"""Baseline JPEG codec: bounded-error round trips (JPEG is lossy —
bit-exact determinism + error bounds are the honest contract), real
variable-length Huffman tables, structural rejections."""

from __future__ import annotations

import numpy as np
import pytest

from geo_spark.operators.jpeg import (
    _ZIGZAG,
    _build_huffman,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // (w - 1),
            yy * 255 // (h - 1),
            (xx + yy) * 255 // (w + h - 2),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_zigzag_is_standard_prefix():
    # first 10 entries of the published zigzag sequence
    assert _ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(_ZIGZAG.tolist()) == list(range(64))


def test_round_trip_bounds_and_determinism():
    img = _gradient()
    data = encode_jpeg(img, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6
    assert encode_jpeg(img, quality=90) == data  # bit-exact determinism
    # quality 100 -> all-ones quant tables: only float/rounding residue
    near = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(near.astype(int) - img.astype(int)).max() <= 2


def test_noise_image_survives_and_stuffing_path():
    """High-entropy input exercises long Huffman codes and 0xFF byte
    stuffing; the error bound is the quantization worst case."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=95)
    assert b"\xff\x00" in data  # stuffing actually happened
    out = decode_jpeg(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 40


def test_non_multiple_of_8_and_grayscale():
    img = _gradient(13, 17)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == (13, 17, 3)
    gray = _gradient(11, 9)[..., 0]
    out = decode_jpeg(encode_jpeg(gray, quality=92))
    assert out.shape == (11, 9, 3)


def test_huffman_tables_variable_length_and_valid():
    """Frequency-built tables must be canonical-decodable, have no
    code of all ones, and actually use multiple lengths on skewed
    frequencies."""
    freq = np.zeros(257)
    freq[0] = 1000
    freq[1] = 10
    freq[2] = 10
    freq[0xF0] = 1
    bits, vals = _build_huffman(freq[:256])
    assert sum(bits) == 4 and sorted(vals) == [0, 1, 2, 0xF0]
    codes = _canonical_codes(bits, vals)
    lens = {ln for _, ln in codes.values()}
    assert len(lens) > 1  # really variable-length
    for code, ln in codes.values():
        assert code != (1 << ln) - 1  # all-ones unassigned
    # prefix-free check
    cs = sorted(
        (format(c, f"0{ln}b") for c, ln in codes.values()), key=len
    )
    for i, a in enumerate(cs):
        for b in cs[i + 1 :]:
            assert not b.startswith(a)


def test_decode_rejects_non_baseline():
    img = _gradient(8, 8)
    data = bytearray(encode_jpeg(img))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg(b"not a jpeg")


def test_decode_image_dispatches_jpeg():
    from geo_spark.operators.multimodal import decode_image

    img = _gradient(16, 16)
    gray = decode_image(encode_jpeg(img, quality=100), 16, 16)
    want = (img.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    assert np.abs(gray.astype(int) - want.astype(int)).max() <= 2
