"""Loop / Polygon binary encoding: byte-layout goldens against the
documented format (s2/loop.go:1261-1419, s2/polygon.go:1044-1216,
s2/rect.go:445-451) and lossless round-trips through both the lossless
and the compressed polygon paths, including the reference's format
auto-choice and the 64-vertex bound-encoding threshold."""

import struct

import numpy as np

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import pip
from geo_spark.kernel.cell import Cell
from geo_spark.kernel.serialization import (
    _COMPRESSED_ENCODING_VERSION,
    _MIN_VERTICES_FOR_BOUND,
    _PROP_BOUND_ENCODED,
    _PROP_ORIGIN_INSIDE,
    _decode_loop_compressed,
    _encode_loop_compressed,
    _read_uvarint,
    ENCODING_VERSION,
    decode_loop,
    decode_polygon,
    encode_loop,
    encode_polygon,
)


def _ring(n: int, lat0=48.85, lng0=2.35, radius=0.5) -> np.ndarray:
    """CCW lat/lng ring, unnormalized to any cell grid (unsnapped)."""
    ang = 2 * np.pi * np.arange(n) / n
    lat = lat0 + radius * np.sin(ang)
    lng = lng0 + radius * np.cos(ang)
    x, y, z = ck.latlng_to_xyz(lat, lng)
    pts = np.stack([x, y, z], axis=1)
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def _snapped_ring(n: int, level: int, lat0=48.85, lng0=2.35) -> np.ndarray:
    """Ring whose vertices are exact centers of level-``level`` cells."""
    ang = 2 * np.pi * np.arange(n) / n
    lat = lat0 + 0.3 * np.sin(ang)
    lng = lng0 + 0.3 * np.cos(ang)
    ids = ck.parent(ck.cellid_from_latlng(lat, lng), level)
    return np.stack([Cell.from_id(int(c)).center() for c in ids])


def test_loop_lossless_byte_layout():
    verts = _ring(5)
    blob = encode_loop(verts, depth=3)
    assert blob[0] == ENCODING_VERSION
    (n,) = struct.unpack_from("<I", blob, 1)
    assert n == 5
    assert blob[5 : 5 + 120] == verts.astype("<f8").tobytes()
    origin_inside = pip.loop_origin_inside(verts)
    assert blob[125] == (1 if origin_inside else 0)
    (depth,) = struct.unpack_from("<i", blob, 126)
    assert depth == 3
    # rect bound: own version byte + 4 doubles, closes the blob
    assert blob[130] == ENCODING_VERSION
    bound = pip.loop_rect_bound(verts, origin_inside)
    assert struct.unpack_from("<4d", blob, 131) == (
        bound.lat.lo,
        bound.lat.hi,
        bound.lng.lo,
        bound.lng.hi,
    )
    assert len(blob) == 131 + 32


def test_loop_lossless_roundtrip():
    for n in (3, 4, 17, 100):
        verts = _ring(n)
        loop, pos = decode_loop(encode_loop(verts, depth=n % 4))
        assert np.array_equal(loop["vertices"], verts)
        assert loop["depth"] == n % 4
        assert loop["origin_inside"] == pip.loop_origin_inside(verts)
        b = pip.loop_rect_bound(verts, loop["origin_inside"])
        got = loop["bound"]
        assert (got.lat.lo, got.lat.hi, got.lng.lo, got.lng.hi) == (
            b.lat.lo,
            b.lat.hi,
            b.lng.lo,
            b.lng.hi,
        )


def test_special_loops_roundtrip():
    # single-vertex empty (z=+1) and full (z=-1) loops, s2/loop.go:107-121
    empty = np.array([[0.0, 0.0, 1.0]])
    full = np.array([[0.0, 0.0, -1.0]])
    le, _ = decode_loop(encode_loop(empty))
    lf, _ = decode_loop(encode_loop(full))
    assert not le["origin_inside"] and le["bound"].is_empty()
    assert lf["origin_inside"] and lf["bound"].is_full()
    assert np.array_equal(le["vertices"], empty)
    assert np.array_equal(lf["vertices"], full)


def test_polygon_lossless_chosen_for_unsnapped():
    shell = _ring(12, radius=0.8)
    hole = _ring(8, radius=0.2)[::-1]  # CW hole
    blob = encode_polygon([shell, hole], depths=[0, 1])
    assert blob[0] == ENCODING_VERSION  # unsnapped -> lossless wins
    poly = decode_polygon(blob)
    assert poly["has_holes"] is True
    assert len(poly["loops"]) == 2
    assert np.array_equal(poly["loops"][0]["vertices"], shell)
    assert np.array_equal(poly["loops"][1]["vertices"], hole)
    assert poly["loops"][1]["depth"] == 1
    # polygon bound is the union over shells only
    sb = pip.loop_rect_bound(shell, pip.loop_origin_inside(shell))
    pb = poly["bound"]
    assert (pb.lat.lo, pb.lat.hi, pb.lng.lo, pb.lng.hi) == (
        sb.lat.lo,
        sb.lat.hi,
        sb.lng.lo,
        sb.lng.hi,
    )


def test_polygon_compressed_chosen_for_snapped():
    shell = _snapped_ring(40, 20)
    blob = encode_polygon([shell])
    assert blob[0] == _COMPRESSED_ENCODING_VERSION
    assert blob[1] == 20  # snap level = the histogram winner
    nloops, _ = _read_uvarint(blob, 2)
    assert nloops == 1
    # ~4 bytes/vertex beats 24 bytes/vertex lossless
    assert len(blob) < 24 * 40
    poly = decode_polygon(blob)
    assert np.array_equal(poly["loops"][0]["vertices"], shell)
    assert poly["has_holes"] is False
    # bound was NOT in the stream (<64 vertices); decode recomputed it
    sb = pip.loop_rect_bound(shell, pip.loop_origin_inside(shell))
    pb = poly["bound"]
    assert (pb.lat.lo, pb.lat.hi, pb.lng.lo, pb.lng.hi) == (
        sb.lat.lo,
        sb.lat.hi,
        sb.lng.lo,
        sb.lng.hi,
    )


def test_polygon_compressed_mixed_offcenter_exact():
    # 3 of the vertices are NOT level-16 centers: they must ride behind
    # the stream as exact float64 triples (s2/pointcompression.go:84-92)
    shell = _snapped_ring(30, 16).copy()
    raw = _ring(30)
    for i in (5, 11, 23):
        shell[i] = raw[i]
    blob = encode_polygon([shell])
    assert blob[0] == _COMPRESSED_ENCODING_VERSION
    poly = decode_polygon(blob)
    assert np.array_equal(poly["loops"][0]["vertices"], shell)


def test_compressed_bound_threshold():
    small = _snapped_ring(_MIN_VERTICES_FOR_BOUND - 1, 18)
    large = _snapped_ring(_MIN_VERTICES_FOR_BOUND, 18)
    for verts, expect_bound in ((small, False), (large, True)):
        out = bytearray()
        _encode_loop_compressed(out, verts, 18, 0, None, None)
        # walk to the props varint: skip count + point block by decoding
        loop, _ = _decode_loop_compressed(bytes(out), 0, 18)
        assert np.array_equal(loop["vertices"], verts)
        n, pos = _read_uvarint(bytes(out), 0)
        from geo_spark.kernel.serialization import _decode_points_compressed_at

        _, pos = _decode_points_compressed_at(bytes(out), pos, 18, n)
        props, _ = _read_uvarint(bytes(out), pos)
        assert bool(props & _PROP_BOUND_ENCODED) is expect_bound
        assert bool(props & _PROP_ORIGIN_INSIDE) == pip.loop_origin_inside(verts)


def test_empty_polygon():
    blob = encode_polygon([])
    assert blob == bytes([_COMPRESSED_ENCODING_VERSION, 30, 0])
    poly = decode_polygon(blob)
    assert poly["loops"] == []
    assert poly["bound"].is_empty()
    assert poly["has_holes"] is False


def test_polygon_rejects_unknown_version():
    import pytest

    with pytest.raises(ValueError):
        decode_polygon(bytes([9, 0, 0]))
