"""Binary cell-id / cell-union codecs: byte-exact against the documented
little-endian layout (version int8, count int64 LE, uint64 ids LE) and
round-trip over random unions at every level."""

import struct

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.serialization import (
    ENCODING_VERSION,
    decode_cellid,
    decode_cellunion,
    encode_cellid,
    encode_cellunion,
)


def test_cellid_layout_golden():
    # token 47e670ebdae55449 is a known Paris leaf cell from the kernel
    # golden-vector suite; its encoding is the raw uint64 little-endian
    cid = int(ck.from_token(["47e670ebdae55449"])[0])
    blob = encode_cellid(cid)
    assert blob == struct.pack("<Q", cid)
    assert len(blob) == 8
    assert decode_cellid(blob) == cid


def test_cellunion_layout_golden():
    cells = [0x1000000000000000, 0x4000000000000000, 0xB000000000000000]
    blob = encode_cellunion(cells)
    want = struct.pack("<bq", ENCODING_VERSION, 3) + b"".join(
        struct.pack("<Q", c) for c in cells
    )
    assert blob == want
    assert list(decode_cellunion(blob)) == cells


def test_round_trip_random_unions():
    rng = np.random.default_rng(7)
    for _ in range(50):
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 20)))
        lng = rng.uniform(-180, 180, 20)
        leaf = ck.cellid_from_latlng(lat, lng)
        lvl = int(rng.integers(0, 31))
        cells = np.unique(ck.parent(leaf, lvl))
        got = decode_cellunion(encode_cellunion(cells))
        assert (got == cells).all()
        assert got.dtype == np.uint64


def test_empty_union():
    blob = encode_cellunion([])
    assert len(blob) == 9
    assert len(decode_cellunion(blob)) == 0


def test_decode_rejects_bad_inputs():
    cells = [1, 2, 3]
    blob = encode_cellunion(cells)
    with pytest.raises(ValueError, match="version"):
        decode_cellunion(b"\x02" + blob[1:])
    with pytest.raises(ValueError, match="truncated"):
        decode_cellunion(blob[:-1])
    with pytest.raises(ValueError, match="too many"):
        decode_cellunion(struct.pack("<bq", ENCODING_VERSION, 2_000_000))
    with pytest.raises(ValueError, match="shorter"):
        decode_cellid(b"\x00")


# ---------------------------------------------------------------------------
# Compressed point encoding (s2/pointcompression_test.go:48-94 cases)
# ---------------------------------------------------------------------------


def _snapped_points(n, level, seed=3):
    """n points on a small circle near the (1,1,1) corner, snapped to
    level-``level`` cell centers (no snap when level > 30) — the analog
    of the reference's makeSnappedPoints."""
    import math

    import numpy as np

    from geo_spark.kernel import cellid as ck
    from geo_spark.kernel.cell import Cell

    ang = np.linspace(0.0, 2 * math.pi, n, endpoint=False)
    lat = 35.264389682754654 + 0.001 * np.sin(ang)
    lng = 45.0 + 0.001 * np.cos(ang)
    x, y, z = ck.latlng_to_xyz(lat, lng)
    pts = np.stack([x, y, z], axis=1)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    if level <= 30:
        ids = ck.parent(ck.cellid_from_latlng(lat, lng), level)
        pts = np.stack([Cell.from_id(int(c)).center() for c in ids])
    return pts


def test_points_compressed_roundtrip_cases():
    import numpy as np

    from geo_spark.kernel.serialization import (
        decode_points_compressed,
        encode_points_compressed,
    )

    cases = [
        ("loop4", _snapped_points(4, 30), 30),
        ("loop4unsnapped", _snapped_points(4, 4), 30),
        ("loop4level14", _snapped_points(4, 14), 14),
        ("loop100", _snapped_points(100, 30), 30),
        ("loop100unsnapped", _snapped_points(100, 100), 30),
    ]
    mixed = _snapped_points(100, 30).copy()
    mixed4 = _snapped_points(100, 4)
    for i in range(15):
        mixed[3 * i] = mixed4[3 * i]
    cases.append(("loop100mixed15", mixed, 30))

    for label, pts, level in cases:
        blob = encode_points_compressed(pts, level)
        got = decode_points_compressed(blob, level, len(pts))
        assert np.allclose(got, pts, atol=1e-14), label
        # snapped-at-level points must round-trip EXACTLY (cell centers)
        if label in ("loop4", "loop4level14", "loop100"):
            assert np.array_equal(got, pts), label


def test_points_compressed_size():
    from geo_spark.kernel.serialization import encode_points_compressed

    pts = _snapped_points(100, 30)
    blob = encode_points_compressed(pts, 30)
    # reference: 8 bytes for the first vertex + ~4/vertex thereafter for
    # nearby snapped points; raw storage is 2400 bytes
    assert len(blob) < 700, len(blob)

    # off-center points cost 24 bytes + index each, exactly recoverable
    raw = _snapped_points(10, 100)
    blob2 = encode_points_compressed(raw, 30)
    assert len(blob2) > 10 * 24


def test_zigzag_reference_table():
    # s2/pointcompression_test.go:96-115
    from geo_spark.kernel.serialization import _zigzag_decode, _zigzag_encode

    table = [
        (0, 0),
        (-1, 1),
        (1, 2),
        (-2, 3),
        (2147483647, 4294967294),
        (-2147483648, 4294967295),
    ]
    for signed, unsigned in table:
        assert _zigzag_encode(signed) == unsigned
        assert _zigzag_decode(unsigned) == signed


def test_interleave_bit_order():
    # s2/interleave.go:128-133: bit 0 of x -> bit 0, bit 0 of y -> bit 1
    from geo_spark.kernel.serialization import _deinterleave32, _interleave32

    assert _interleave32(1, 0) == 1
    assert _interleave32(0, 1) == 2
    assert _interleave32(0xFFFFFFFF, 0) == 0x5555555555555555
    for x, y in [(123456789, 987654321), (0, 0), (0xFFFFFFFF, 0xFFFFFFFF)]:
        assert _deinterleave32(_interleave32(x, y)) == (x, y)
