"""Golden-vector tests for the numpy S2 cell-id kernel.

Vectors are copied verbatim from the reference's own test suite:
  - tokens:        s2/cellid_test.go:340-389 (+ error cases :391-425)
  - cellid<->latlng: s2/cellid_test.go:171-204 (C++-generated)
  - edge neighbors: s2/cellid_test.go:206-237
  - vertex neighbors: s2/cellid_test.go:239-270
"""

import numpy as np
import pytest

from geo_spark.kernel import cellid as c

TOKEN_VECTORS = [
    ("1", 0x1000000000000000),
    ("3", 0x3000000000000000),
    ("14", 0x1400000000000000),
    ("41", 0x4100000000000000),
    ("094", 0x0940000000000000),
    ("537", 0x5370000000000000),
    ("3fec", 0x3FEC000000000000),
    ("72f3", 0x72F3000000000000),
    ("52b8c", 0x52B8C00000000000),
    ("990ed", 0x990ED00000000000),
    ("4476dc", 0x4476DC0000000000),
    ("2a724f", 0x2A724F0000000000),
    ("7d4afc4", 0x7D4AFC4000000000),
    ("b675785", 0xB675785000000000),
    ("40cd6124", 0x40CD612400000000),
    ("3ba32f81", 0x3BA32F8100000000),
    ("08f569b5c", 0x08F569B5C0000000),
    ("385327157", 0x3853271570000000),
    ("166c4d1954", 0x166C4D1954000000),
    ("96f48d8c39", 0x96F48D8C39000000),
    ("0bca3c7f74c", 0x0BCA3C7F74C00000),
    ("1ae3619d12f", 0x1AE3619D12F00000),
    ("07a77802a3fc", 0x07A77802A3FC0000),
    ("4e7887ec1801", 0x4E7887EC18010000),
    ("4adad7ae74124", 0x4ADAD7AE74124000),
    ("90aba04afe0c5", 0x90ABA04AFE0C5000),
    ("8ffc3f02af305c", 0x8FFC3F02AF305C00),
    ("6fa47550938183", 0x6FA4755093818300),
    ("aa80a565df5e7fc", 0xAA80A565DF5E7FC0),
    ("01614b5e968e121", 0x01614B5E968E1210),
    ("aa05238e7bd3ee7c", 0xAA05238E7BD3EE7C),
    ("48a23db9c2963e5b", 0x48A23DB9C2963E5B),
]

# (cellid, lat_deg, lng_deg) — s2/cellid_test.go:171-204.
LATLNG_VECTORS = [
    (0x47A1CBD595522B39, 49.703498679, 11.770681595),
    (0x46525318B63BE0F9, 55.685376759, 12.588490937),
    (0x52B30B71698E729D, 45.486546517, -93.449700022),
    (0x46ED8886CFADDA85, 58.299984854, 23.049300056),
    (0x3663F18A24CBE857, 34.364439040, 108.330699969),
    (0x10A06C0A948CF5D, -30.694551352, -30.048758753),
    (0x2B2BFD076787C5DF, -25.285264027, 133.823116966),
    (0xB09DFF882A7809E1, -75.000000031, 0.000000133),
    (0x94DAA3D000000001, -24.694439215, -47.537363213),
    (0x87A1000000000001, 38.899730392, -99.901813021),
    (0x4FC76D5000000001, 81.647200334, -55.631712940),
    (0x3B00955555555555, 10.050986518, 78.293170610),
    (0x1DCC469991555555, -34.055420593, 18.551140038),
    (0xB112966AAAAAAAAB, -69.219262171, 49.670072392),
]


def test_tokens_roundtrip():
    tokens = [t for t, _ in TOKEN_VECTORS]
    ids = np.array([i for _, i in TOKEN_VECTORS], dtype=np.uint64)
    np.testing.assert_array_equal(c.from_token(tokens), ids)
    assert c.to_token(ids) == tokens


def test_token_error_cases():
    assert c.to_token(np.array([0], dtype=np.uint64)) == ["X"]
    assert c.from_token(["X"])[0] == 0
    # sentinel round trip
    sentinel = np.array([0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    assert c.from_token(c.to_token(sentinel))[0] == sentinel[0]
    for bad in ["876b e99", "876bee99\n", "876[ee99", " 876bee99"]:
        assert c.from_token([bad])[0] == 0


def test_cellid_from_latlng_exact():
    ids = np.array([i for i, _, _ in LATLNG_VECTORS], dtype=np.uint64)
    lat = np.array([la for _, la, _ in LATLNG_VECTORS])
    lng = np.array([ln for _, _, ln in LATLNG_VECTORS])
    got = c.cellid_from_latlng(lat, lng)
    np.testing.assert_array_equal(got, ids)


def test_cellid_to_latlng_within_1e9_degrees():
    ids = np.array([i for i, _, _ in LATLNG_VECTORS], dtype=np.uint64)
    lat, lng = c.cellid_to_latlng(ids)
    want_lat = np.array([la for _, la, _ in LATLNG_VECTORS])
    want_lng = np.array([ln for _, _, ln in LATLNG_VECTORS])
    # haversine angular distance must be < 1e-9 degrees (~0.1mm),
    # matching LatLng.Distance (s2/latlng.go:61-69)
    la1, lo1 = np.radians(lat), np.radians(lng)
    la2, lo2 = np.radians(want_lat), np.radians(want_lng)
    dlat = np.sin(0.5 * (la2 - la1))
    dlng = np.sin(0.5 * (lo2 - lo1))
    x = dlat * dlat + dlng * dlng * np.cos(la1) * np.cos(la2)
    dist = 2 * np.arcsin(np.sqrt(np.minimum(1.0, x)))
    assert np.degrees(dist).max() < 1e-9


def test_level_parent_range():
    ids = np.array([i for i, _, _ in LATLNG_VECTORS], dtype=np.uint64)
    assert (c.level(ids[:8]) == 30).all()  # first 8 are leaves
    # parent at level l has lsb at 2*(30-l) and contains the leaf
    for lvl in [0, 5, 10, 20, 29]:
        p = c.parent(ids, lvl)
        assert (c.level(p) == lvl).all()
        assert c.contains(p, ids).all()
        assert (c.range_min(p) <= ids).all() and (ids <= c.range_max(p)).all()
    # parent at level 30 of a leaf is itself
    np.testing.assert_array_equal(c.parent(ids[:8], 30), ids[:8])


def test_face_ij_roundtrip():
    rng = np.random.default_rng(42)
    f = rng.integers(0, 6, 1000)
    i = rng.integers(0, c.MAX_SIZE, 1000)
    j = rng.integers(0, c.MAX_SIZE, 1000)
    ids = c.cellid_from_face_ij(f, i, j)
    f2, i2, j2, _ = c.face_ij_orientation(ids)
    np.testing.assert_array_equal(f2, f)
    np.testing.assert_array_equal(i2, i)
    np.testing.assert_array_equal(j2, j)


def test_edge_neighbors_face1_corner():
    # s2/cellid_test.go:206-237: edge neighbors of face-1 (0,0) corner cell.
    face_cell = c.parent(c.cellid_from_face_ij(1, 0, 0), 0)
    nbrs = c.edge_neighbors(face_cell)[0]
    assert list(c.face(nbrs)) == [5, 3, 2, 0]
    assert (c.level(nbrs) == 0).all()

    max_ij = c.MAX_SIZE - 1
    for lvl in range(1, c.MAX_LEVEL + 1):
        cid = c.parent(c.cellid_from_face_ij(1, 0, 0), lvl)
        size = 1 << (c.MAX_LEVEL - lvl)
        want = np.array(
            [
                c.parent(c.cellid_from_face_ij(5, max_ij, max_ij), lvl),
                c.parent(c.cellid_from_face_ij(1, size, 0), lvl),
                c.parent(c.cellid_from_face_ij(1, 0, size), lvl),
                c.parent(c.cellid_from_face_ij(0, max_ij, 0), lvl),
            ],
            dtype=np.uint64,
        ).reshape(4)
        np.testing.assert_array_equal(c.edge_neighbors(cid)[0], want)


def test_vertex_neighbors():
    # s2/cellid_test.go:239-270: vertex neighbors of face-2 center at level 5.
    cid = c.cellid_from_xyz(np.array([0.0]), np.array([0.0]), np.array([1.0]))
    nbrs = np.sort(c.vertex_neighbors(cid, 5)[0])
    half = 1 << 29
    want = set()
    for n in range(4):
        i = half - 1 if n < 2 else half
        j = half - 1 if n in (0, 3) else half
        want.add(int(c.parent(c.cellid_from_face_ij(2, i, j), 5)))
    assert set(int(x) for x in nbrs) == want

    # corner of faces 0, 4, 5: only 3 neighbors at level 0
    corner = c.parent(np.array([(0 << 61) + 1], dtype=np.uint64), 30)
    nbrs = np.sort(c.vertex_neighbors(corner, 0)[0])
    assert len(nbrs) == 3
    faces = sorted(int(x) for x in c.face(nbrs))
    assert faces == [0, 4, 5]


def test_all_neighbors_consistent_with_vertex_neighbors():
    # Mirrors TestCellIDAllNeighbors (s2/cellid_test.go:300-335): AllNeighbors
    # plus own children at lvl == union of children's vertex neighbors at lvl.
    rng = np.random.default_rng(7)
    for _ in range(40):
        f = int(rng.integers(0, 6))
        i = int(rng.integers(0, c.MAX_SIZE))
        j = int(rng.integers(0, c.MAX_SIZE))
        lvl0 = int(rng.integers(0, 25))
        cid = int(c.parent(c.cellid_from_face_ij(f, i, j), lvl0))
        max_diff = min(5, c.MAX_LEVEL - lvl0 - 1)
        lvl = lvl0 + int(rng.integers(0, max_diff + 1))

        got = set(int(x) for x in c.all_neighbors(cid, lvl))
        # add children of cid at lvl
        begin = int(c.child_begin_at_level(np.array([cid], dtype=np.uint64), lvl + 1)[0])
        end = int(c.child_end_at_level(np.array([cid], dtype=np.uint64), lvl + 1)[0])
        step = 2 * int(c.lsb(np.array([begin], dtype=np.uint64))[0])
        children = np.arange(begin, end, step, dtype=np.uint64)
        all_set = got | set(int(x) for x in c.parent(children, lvl))
        want = set()
        for ch_rows in c.vertex_neighbors(children, lvl):
            want |= set(int(x) for x in ch_rows)
        assert all_set == want


def test_signed_bias_order_preserving():
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2**63, 500, dtype=np.uint64) * 2 + rng.integers(
        0, 2, 500, dtype=np.uint64
    )
    s = c.to_signed(u)
    assert (np.argsort(s, kind="stable") == np.argsort(u, kind="stable")).all()
    np.testing.assert_array_equal(c.from_signed(s), u)


def test_common_ancestor_level():
    a = c.cellid_from_latlng(np.array([48.0]), np.array([2.0]))
    p10 = c.parent(a, 10)
    children = c.child_begin_at_level(p10, 30)
    assert c.common_ancestor_level(a, children)[0] >= 10
    b = c.cellid_from_latlng(np.array([-48.0]), np.array([170.0]))
    assert c.common_ancestor_level(a, b)[0] == -1 or c.face(a)[0] == c.face(b)[0]
